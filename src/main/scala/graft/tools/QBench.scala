package graft.tools

import java.nio.file.{Files, Paths}

/** Per-query measurement probe for optimization rounds (guide §1):
  * times each named query with the NOOP SINK (computes every column,
  * discards output — not count(), which lets the optimizer prune) and
  * optionally dumps `.explain("formatted")` to a file.
  *
  * Usage: runMain graft.tools.QBench <sfDir> <q1,q2,..|all> [runs]
  * [planDir]. Prints one line per query: name, per-run seconds. Not
  * part of the driver contract — graft.Bench stays the graded bench.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(',').toSeq
    val runs = if (args.length > 2) args(2).toInt else 2 // 0 = plan-only
    val planDir = if (args.length > 3) Some(args(3)) else None
    val spark = graft.GraftSession.get()
    graft.GraftSession.quietWindowWarnings()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables(spark, sfDir, "region").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      planDir.foreach { d =>
        Files.createDirectories(Paths.get(d))
        val df = fn(spark, sfDir)
        Files.writeString(Paths.get(s"$d/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      // SPARK_GRAFT_QBENCH_COUNT=1 times fn().count() — the graded
      // Bench action — instead of the noop sink; count() can prune
      // final projections, so the two modes legitimately differ.
      val useCount = sys.env.get("SPARK_GRAFT_QBENCH_COUNT").contains("1")
      val times = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"qbench:$name")
        if (useCount) fn(spark, sfDir).count()
        else fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (times.nonEmpty)
        println(f"QBENCH $name%-40s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
      else println(s"QBENCH $name plan-only")
    }
    spark.stop()
  }
}
