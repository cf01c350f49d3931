package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lifecycle mining: assemble `start`/`complete` event pairs into
  * activity instances and derive service times — the consumer of the
  * `lifecycle:transition` column the XES reader surfaces
  * (`/root/reference/src/stream/xes.rs` event attributes; the book
  * corpus is complete-only, so this op is the general-log path).
  *
  * Pairing rule: within a (case, activity), the i-th `start` matches
  * the i-th `complete` in event order — FIFO matching, the standard
  * convention when instance ids are absent. Completes without a start
  * (complete-only logs) become zero-length instances anchored at the
  * complete event; starts without a complete are dropped as open
  * instances (reported separately).
  *
  * Scale shape: one (case, activity) window shuffle for the per-kind
  * sequence numbers, then a co-partitioned full-outer join on
  * (case, activity, k) — no driver state, no per-case quadratic work.
  */
object Lifecycle {

  /** Activity instances:
    * `(case, activity, k, start_us, complete_us, service_us)` —
    * `k` is the 1-based instance index; `service_us = -1` marks a
    * complete-only instance (no observed start).
    */
  def activityInstances(events: DataFrame, caseCol: String,
      activityCol: String, lifecycleCol: String, tsCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol), col(activityCol))
      .orderBy(col(tsCol), col(tieBreak))
    val lc = lower(col(lifecycleCol))
    val numbered = events
      .select(col(caseCol), col(activityCol), lc.as("_lc"),
        unix_micros(col(tsCol)).as("_us"), col(tsCol), col(tieBreak))
      .filter(col("_lc").isin("start", "complete"))
      .withColumn("_k", row_number().over(
        Window.partitionBy(col(caseCol), col(activityCol), col("_lc"))
          .orderBy(col(tsCol), col(tieBreak))))
    val starts = numbered.filter(col("_lc") === "start")
      .select(col(caseCol), col(activityCol), col("_k").as("k"),
        col("_us").as("start_us"))
    val completes = numbered.filter(col("_lc") === "complete")
      .select(col(caseCol), col(activityCol), col("_k").as("k"),
        col("_us").as("complete_us"))
    completes.join(starts, Seq(caseCol, activityCol, "k"), "left")
      .select(col(caseCol), col(activityCol), col("k"),
        coalesce(col("start_us"), col("complete_us")).as("start_us"),
        col("complete_us"),
        when(col("start_us").isNull, lit(-1L))
          .otherwise(col("complete_us") - col("start_us")).as("service_us"))
  }

  /** Open instances: starts whose FIFO slot has no complete. */
  def openInstances(events: DataFrame, caseCol: String,
      activityCol: String, lifecycleCol: String, tsCol: String,
      tieBreak: String): DataFrame = {
    val lc = lower(col(lifecycleCol))
    val numbered = events
      .select(col(caseCol), col(activityCol), lc.as("_lc"),
        unix_micros(col(tsCol)).as("_us"), col(tsCol), col(tieBreak))
      .filter(col("_lc").isin("start", "complete"))
      .withColumn("_k", row_number().over(
        Window.partitionBy(col(caseCol), col(activityCol), col("_lc"))
          .orderBy(col(tsCol), col(tieBreak))))
    val starts = numbered.filter(col("_lc") === "start")
      .select(col(caseCol), col(activityCol), col("_k").as("k"),
        col("_us").as("start_us"))
    val completes = numbered.filter(col("_lc") === "complete")
      .select(col(caseCol), col(activityCol), col("_k").as("k"))
    starts.join(completes, Seq(caseCol, activityCol, "k"), "left_anti")
  }

  /** Per-activity service-time profile over the matched instances
    * (complete-only instances excluded): `(activity, n_instances,
    * sum_service_us, min_service_us, max_service_us)`.
    */
  def serviceTimes(events: DataFrame, caseCol: String, activityCol: String,
      lifecycleCol: String, tsCol: String, tieBreak: String): DataFrame =
    activityInstances(events, caseCol, activityCol, lifecycleCol, tsCol,
      tieBreak)
      .filter(col("service_us") >= 0)
      .groupBy(col(activityCol).as("activity"))
      .agg(count(lit(1)).as("n_instances"),
        sum("service_us").as("sum_service_us"),
        min("service_us").as("min_service_us"),
        max("service_us").as("max_service_us"))
}
