package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print the formatted physical plan of selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      println(s"========== $name ==========")
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      // SPARK_GRAFT_EXPLAIN_FINAL=1: run the query, then print the
      // AQE FINAL plan (runtime exchange reuse, join rewrites,
      // coalesced reads are invisible in the pre-execution plan)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN_FINAL").contains("1")) {
        df.count()
        println(s"---------- $name FINAL ----------")
        println(df.queryExecution.executedPlan.toString.take(20000))
      }
    }
    spark.stop()
  }
}
