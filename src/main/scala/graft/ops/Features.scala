package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-feature extraction — the event-log → supervised-training-set
  * bridge (remaining-time / next-activity prediction): one labeled
  * example per event prefix, with leakage-free features (everything
  * computable at that point in the case) and the standard labels.
  *
  * Scale shape: ONE case-key shuffle serves everything — the repeat
  * counter's finer (case, activity) window is satisfied by the case
  * partitioning (clustered-distribution subsumption), so Spark adds
  * only a partition-local re-sort, not a second exchange. No joins,
  * nothing on the driver (PlanShapeSpec pins the single exchange).
  */
object Features {

    /** Per-event training rows:
    * `(case, position, activity, elapsed_us, since_prev_us,
    *   n_repeats_so_far, remaining_us, remaining_events, next_activity)`
    * — `position` is 1-based; `remaining_events` counts strictly-later
    * events; sentinels keep the schema null-free for downstream
    * training frameworks: `since_prev_us = -1` on the first event of a
    * case, `next_activity = ''` on the last.
    */
  def prefixFeatures(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieBreak))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val us = unix_micros(col(tsCol))
    events
      .select(col(caseCol), col(activityCol), col(tsCol), col(tieBreak))
      .withColumn("position", row_number().over(w))
      .withColumn("elapsed_us", us - first(us).over(w))
      .withColumn("since_prev_us",
        coalesce(us - lag(us, 1).over(w), lit(-1L)))
      .withColumn("n_repeats_so_far",
        count(lit(1)).over(
          Window.partitionBy(col(caseCol), col(activityCol))
            .orderBy(col(tsCol), col(tieBreak))
            .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("remaining_us", last(us).over(wAll) - us)
      .withColumn("remaining_events",
        count(lit(1)).over(wAll) - col("position"))
      .withColumn("next_activity",
        coalesce(lead(col(activityCol), 1).over(w), lit("")))
      .select(col(caseCol), col("position"), col(activityCol),
        col("elapsed_us"), col("since_prev_us"), col("n_repeats_so_far"),
        col("remaining_us"), col("remaining_events"), col("next_activity"))
  }
}
