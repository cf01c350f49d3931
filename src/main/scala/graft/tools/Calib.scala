package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-calibration probes shared by the three bench mains.
  *
  * The LIGHT probe (the r11 scheme) is one small single-stage job —
  * pure CPU + scheduler, no IO — whose drift tracks full-pool
  * contention. Its documented blind spot (SCALE.md, two rounds
  * running): an external burst that steals PART of the 32-thread
  * width barely moves a job this small, while a 32-task operator row
  * slows by the stolen fraction. The PARALLEL probe closes it: a
  * fixed 32-task two-stage shuffle that saturates the full executor
  * width, so partial-width contention shifts it proportionally even
  * when the light probe stays quiet. Both series ship in every
  * artifact (probe rows carry […, light_s, load, par_s]); a run is
  * flagged CONTENDED when either series' median drifts > 1.2× its
  * own quiet baseline.
  */
object Calib {

  val DriftFactor = 1.2

  /** Single-stage CPU probe (~0.02 s quiet). */
  def probe(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Full-width probe: 32 map tasks → shuffle → 97-group aggregate
    * (~0.1 s quiet). Partition count is FIXED at 32 (the bench pool
    * width) so the measurement is comparable across sessions. */
  def probePar(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 3200000L, 1L, 32)
      .selectExpr("id % 97 AS k", "id")
      .groupBy("k").sum("id").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Median-vs-baseline drift flag over one probe series. */
  def contended(probes: Seq[Double], base: Double): Boolean =
    probes.nonEmpty && base > 0 &&
      probes.sorted.apply(probes.size / 2) > DriftFactor * base
}
