package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.TraceCluster

/** Contaminated-inventory probe for the entity-match kernel (the r10
  * judge's item #3): the ×100 serial-ID supplier universe PLUS one
  * name without the majority prefix, which disables the global affix
  * strip. r10 measured ~34 s on the bins-only degraded path; the
  * grouped dominant-prefix path (TraceCluster.groupedPairs) must keep
  * the run near the defended ~10-12 s. Also runs the CLEAN universe
  * for the side-by-side figure.
  *
  * Usage: ProbeEntity [scaledDir] [runs]
  */
object ProbeEntity {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val names = Tables(spark, dir, "supplier").select(
      col("s_name").as("variant"),
      col("s_suppkey").cast("long").as("rep_case"),
      lit(1L).as("n_cases"))
    val contaminated = names.unionByName(spark.range(1).select(
      lit("acme corp").as("variant"),
      lit(999999999999L).as("rep_case"), lit(1L).as("n_cases")))
    // r11 multi-family case: half the universe re-headed to a second
    // serial family of the same length — no single dominant affix, the
    // r10 global strip AND the single-group fallback both blind
    val twoFamily = names.withColumn("variant",
      when(col("rep_case") % 2 === 0, col("variant"))
        .otherwise(concat(lit("Vendorrr#"), substring(col("variant"), 10, 99))))
    for ((tag, inv) <- Seq("clean" -> names, "contaminated" -> contaminated,
           "two-family" -> twoFamily);
         r <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = TraceCluster.editPairs(inv, maxDist = 1).count()
      println(f"[probe] $tag%-13s run $r: pairs=$n%,d  ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    spark.stop()
  }
}
