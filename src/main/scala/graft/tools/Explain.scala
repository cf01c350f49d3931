package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print the formatted physical plan of selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
