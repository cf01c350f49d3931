package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analogue of the reference's `StatsCollector`
  * (`/root/reference/src/stream/stats.rs:63-141`): incremental
  * counters over an unbounded event stream. The reference's one-pass
  * bounded-memory counting IS Spark's incremental stateful
  * aggregation; `outputMode(update)` emits the running triple.
  */
object StreamingStats {

  /** Running [n_traces, n_events_total, n_orphans] over a streaming
    * events DataFrame. `approx_count_distinct` keeps state bounded at
    * scale (HLL sketch) — exact distinct over an unbounded key space
    * is unbounded state by definition. */
  def running(events: DataFrame, caseCol: String): DataFrame =
    events.agg(
      approx_count_distinct(caseCol).as("n_traces_approx"),
      count(lit(1)).as("n_events_total"),
      (count(lit(1)) - count(col(caseCol))).as("n_orphan_events"))

  /** Per-case running event counts + time bounds (the `ct_trace`
    * vector as an updatable table; watermark bounds state). */
  def perCase(events: DataFrame, caseCol: String, tsCol: String): DataFrame =
    events.groupBy(col(caseCol)).agg(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("t_start"),
      max(col(tsCol)).as("t_end"))

  /** Streaming exactly-once dedup on an id column: duplicates arriving
    * within the watermark window are dropped with bounded state —
    * the streaming face of the dedup family (at-least-once sources
    * made effectively-once). `df` must already carry a watermark. */
  def dedup(events: DataFrame, idCols: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(idCols)

  /** Per-case session aggregates via Spark's BUILT-IN session window
    * (gap-based, watermark-closed) — the declarative counterpart of
    * [[TraceAssembly]]: use this when per-session aggregates suffice
    * (counts, bounds), and the custom state op when the closed trace
    * itself (ordered activities) is the product. */
  def sessionStats(events: DataFrame, caseCol: String, tsCol: String,
      gapSeconds: Long): DataFrame =
    events.groupBy(
      session_window(col(tsCol), s"$gapSeconds seconds"),
      col(caseCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"), max(col(tsCol)).as("t_end"))
      .select(col(caseCol), col("n_events"), col("t_start"), col("t_end"))

  /** Windowed event rates: tumbling-window counts per activity —
    * the standard watermark + window aggregation. */
  def windowedRates(events: DataFrame, tsCol: String, activityCol: String,
      windowSeconds: Long): DataFrame =
    events.groupBy(
      window(col(tsCol), s"$windowSeconds seconds"),
      col(activityCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col(activityCol), col("n"))
}
