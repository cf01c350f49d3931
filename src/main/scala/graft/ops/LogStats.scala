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

  /** Work-in-progress curve: per period, cases arriving (first event
    * in that bucket), cases completing (last event), and the open-case
    * count at period end — the load view every process dashboard
    * draws.
    *
    * Scale shape: one (case) agg for the intervals, one tiny
    * period-sized rollup; the running sum's single-partition window
    * is over period rows only (bounded by the time horizon, not the
    * log — a century of days is 36 525 rows), all in exact Longs.
    */
  def wipCurve(events: DataFrame, caseCol: String, tsCol: String,
      granularity: String = "day"): DataFrame = {
    val spans = events.filter(col(caseCol).isNotNull)
      .groupBy(col(caseCol))
      .agg(date_trunc(granularity, min(col(tsCol))).as("_start"),
        date_trunc(granularity, max(col(tsCol))).as("_end"))
    val deltas = spans.select(col("_start").as("period"), lit(1L).as("_arr"),
        lit(0L).as("_cmp"))
      .unionByName(spans.select(col("_end").as("period"), lit(0L).as("_arr"),
        lit(1L).as("_cmp")))
      .groupBy("period")
      .agg(sum("_arr").as("n_arrived"), sum("_cmp").as("n_completed"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("period"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    deltas.select(col("period"), col("n_arrived"), col("n_completed"),
      (sum(col("n_arrived")).over(w) - sum(col("n_completed")).over(w))
        .as("wip_end"))
  }
}
