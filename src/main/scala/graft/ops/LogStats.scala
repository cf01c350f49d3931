package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** StatsCollector analogue — the reference's streaming counters
  * (`/root/reference/src/stream/stats.rs:63-141`): number of traces,
  * number of events inside traces, total events; standalone events =
  * total − in-traces.
  *
  * One single-pass aggregation (map-side partial agg, no join): on a
  * 100 TB log this is a full scan + one tiny shuffle of partial
  * counters. `count(DISTINCT case)` is planned by Spark as a two-stage
  * expand-agg, still linear.
  */
object LogStats {

  /** Counts over a flat event table. Events with a NULL case id are
    * "standalone events" (a log containing only events is also called
    * a stream — reference log.rs:13-21).
    */
  def stats(events: DataFrame, caseCol: String): DataFrame =
    events.agg(
      count_distinct(col(caseCol)).as("n_traces"),
      count(lit(1)).as("n_events_total"),
      (count(lit(1)) - count(col(caseCol))).as("n_orphan_events"))

  /** Per-trace event counts — the `ct_trace` vector of the reference's
    * `Statistics` artifact (stats.rs:70-110) as a DataFrame.
    */
  def perTrace(events: DataFrame, caseCol: String): DataFrame =
    events.filter(col(caseCol).isNotNull)
      .groupBy(col(caseCol)).agg(count(lit(1)).as("n_events"))

  /** The reference artifact's counts triple `[n_traces,
    * n_events_in_traces, n_events_total]` collected to the driver —
    * the "artifact" form (SURVEY.md §1.4).
    */
  case class Statistics(nTraces: Long, nEventsInTraces: Long, nEventsTotal: Long) {
    def standalone: Long = nEventsTotal - nEventsInTraces
    def counts: Seq[Long] = Seq(nTraces, nEventsInTraces, nEventsTotal)
  }

  def collect(events: DataFrame, caseCol: String): Statistics = {
    val r = events.agg(
      count_distinct(col(caseCol)).as("t"),
      count(col(caseCol)).as("in_t"),
      count(lit(1)).as("tot")).head()
    Statistics(r.getLong(0), r.getLong(1), r.getLong(2))
  }
}
