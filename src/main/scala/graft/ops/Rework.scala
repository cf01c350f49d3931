package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rework analysis — the standard repeated-activity diagnostics over
  * an event log (an activity executed more than once in a case signals
  * loops/rework; the reference's trace model makes per-case activity
  * multiplicity first-class via its classifier identity,
  * `/root/reference/src/stream/component.rs:76-81`).
  *
  * Scale shape: one partial-aggregated shuffle on (case, activity) —
  * combiner collapses each task's local repeats first — then an
  * alphabet-sized rollup. No windows, no per-case materialization.
  */
object Rework {

  /** Per activity: cases it occurs in, cases where it repeats, the
    * total number of excess executions, and the worst per-case repeat
    * count. All integer — bit-exact against any SQL engine. */
  def perActivity(events: DataFrame, caseCol: String,
      activityCol: String): DataFrame =
    events
      .groupBy(col(caseCol), col(activityCol).as("activity"))
      .agg(count(lit(1)).as("_k"))
      .groupBy(col("activity"))
      .agg(
        count(lit(1)).as("n_cases"),
        sum(when(col("_k") > 1, 1L).otherwise(0L)).as("n_rework_cases"),
        sum(col("_k") - 1).as("n_excess"),
        max(col("_k")).as("max_per_case"))
}
