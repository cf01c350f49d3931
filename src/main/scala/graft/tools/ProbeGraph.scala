package graft.tools

import org.apache.spark.sql.functions._

/** Phase-isolated timings for the co-order graph family (r17 bench
  * work): pairs derivation vs the downstream peel/stats/collect. */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get()
    graft.GraftSession.quietWindowWarnings()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val pairs = graft.ops.Triangles.coOrderPartPairs(spark, dir)
      t("pairs noop") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      val n = t("pairs count")(pairs.count())
      println(s"PROBE n_pairs $n")
      t("pairs collect") {
        val rows = pairs.collect()
        println(s"PROBE collected ${rows.length}")
      }
      t("kcore full") {
        graft.ops.Triangles.kCorePeel(pairs, k = 100, rounds = 3)
          .write.format("noop").mode("overwrite").save()
      }
      t("triangles full") {
        graft.ops.Triangles.stats(pairs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
