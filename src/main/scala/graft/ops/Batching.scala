package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batching-behavior detection — the resource-dimension companion of
  * [[Sessionize]]: instead of gap-sessions per CASE, maximal runs of
  * the SAME activity by the SAME resource with inter-event gaps at
  * most `gapUs` (the "batch processing" pattern of the queue-mining /
  * batch-detection literature: a resource executing one activity many
  * times back-to-back).
  *
  * Scale shape: both window passes share ONE (activity, resource)-key
  * exchange and sort (lag, then the running batch-id prefix sum over
  * the same ordering — Catalyst plans them in a single Window stage);
  * the two rollups after it shrink monotonically (occurrence rows →
  * batch rows → alphabet-bounded activity rows). A single hot
  * (activity, resource) pair lands on one partition — the same bound
  * every per-entity window in the repo carries, and batching is
  * per-resource by definition.
  */
object Batching {

  /** Per-batch rows: `(activity, resource, batch_id, batch_size,
    * t_start_us, t_end_us)` — one row per maximal run. A row whose gap
    * to its predecessor is NULL (run head) or > gapUs starts a new
    * batch; `batch_id` is the running count of batch starts, unique
    * within (activity, resource).
    */
  def batches(events: DataFrame, activityCol: String, resourceCol: String,
      tsCol: String, tieBreak: String, gapUs: Long): DataFrame = {
    require(gapUs >= 0L, s"gap must be >= 0 us: $gapUs")
    events
      .select(col(activityCol).as("activity"), col(resourceCol).as("resource"),
        unix_micros(col(tsCol)).as("_us"), col(tieBreak))
      .withColumn("_new",
        // NULL lag (first row of the run) falls to otherwise(1): a
        // head always opens a batch
        when(col("_us") - lag(col("_us"), 1).over(
          Window.partitionBy(col("activity"), col("resource"))
            .orderBy(col("_us"), col(tieBreak))) <= gapUs, 0L).otherwise(1L))
      .withColumn("batch_id",
        sum(col("_new")).over(
          Window.partitionBy(col("activity"), col("resource"))
            .orderBy(col("_us"), col(tieBreak))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("activity"), col("resource"), col("batch_id"))
      .agg(count(lit(1)).as("batch_size"),
        min(col("_us")).as("t_start_us"),
        max(col("_us")).as("t_end_us"))
  }

  /** Activity-level batching summary: `(activity, n_batches,
    * max_batch_size, n_batched_events)` where n_batched_events counts
    * events inside batches of size ≥ 2 (events actually processed in
    * bulk rather than singly). */
  def summary(events: DataFrame, activityCol: String, resourceCol: String,
      tsCol: String, tieBreak: String, gapUs: Long): DataFrame =
    batches(events, activityCol, resourceCol, tsCol, tieBreak, gapUs)
      .groupBy(col("activity"))
      .agg(count(lit(1)).as("n_batches"),
        max(col("batch_size")).as("max_batch_size"),
        sum(when(col("batch_size") >= 2L, col("batch_size")).otherwise(0L))
          .as("n_batched_events"))
}
