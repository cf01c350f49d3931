package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch per-query profiler (dev tool): runs the named gate queries
  * N times each and prints every timing, separating first-run
  * (planning+codegen) cost from steady state. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "4").toInt
    val spark = GraftSession.get("32")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables(spark, dir, "region").count()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profq] $name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
