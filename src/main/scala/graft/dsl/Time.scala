package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time extension — Spark analogue of the reference's `TimeType`
  * Allen-style interval algebra and trace views
  * (`/root/reference/src/stream/extension/time.rs:20-127`).
  *
  * A *trace's* time view is the interval (first event ts, last event
  * ts); an *event's* view is the degenerate interval (ts, ts). We
  * materialize trace views with [[traceIntervals]] — one shuffle on the
  * case key with map-side partial min/max, so it scales linearly — and
  * express every predicate over `(t_start, t_end)` columns so the same
  * predicate works for events (pass the ts column for both bounds).
  *
  * Reference semantics (time.rs): for self interval (t1,t2) vs other
  * (t3,t4): eq ⇔ t1=t3 ∧ t2=t4; before ⇔ t2 &lt; t3; after ⇔ t4 &lt; t1;
  * in ⇔ t3≤t1 ∧ t2≤t4; starts_in ⇔ t3≤t1≤t4; ends_in ⇔ t3≤t2≤t4;
  * eq_tol ⇔ |t1-t3|≤tol ∧ |t2-t4|≤tol.
  */
object Time {
  val DefaultStart = "t_start"
  val DefaultEnd = "t_end"

  /** Trace time view (time.rs:92-127): interval of first/last event
    * timestamps per case, plus the event count. The reference *errors*
    * on an empty trace and on a reversed interval; group-by cannot
    * produce either.
    */
  def traceIntervals(events: DataFrame, caseCol: String, tsCol: String): DataFrame =
    events.groupBy(col(caseCol)).agg(
      min(col(tsCol)).as(DefaultStart),
      max(col(tsCol)).as(DefaultEnd),
      count(lit(1)).as("n_events"))

  private def s: Column = col(DefaultStart)
  private def e: Column = col(DefaultEnd)

  def isEq(l: Column, r: Column): Column = s === l && e === r
  def isEqTol(l: Column, r: Column, tolSeconds: Long): Column =
    abs(unix_micros(s) - unix_micros(l)) <= tolSeconds * 1000000L &&
      abs(unix_micros(e) - unix_micros(r)) <= tolSeconds * 1000000L
  def isBefore(t: Column): Column = e < t
  def isAfter(t: Column): Column = s > t
  def isIn(l: Column, r: Column): Column = l <= s && e <= r
  def startsIn(l: Column, r: Column): Column = l <= s && s <= r
  def endsIn(l: Column, r: Column): Column = l <= e && e <= r

  /** Event-scope predicates — degenerate interval (ts, ts). */
  def eventBefore(tsCol: String, t: Column): Column = col(tsCol) < t
  def eventAfter(tsCol: String, t: Column): Column = col(tsCol) > t
  def eventIn(tsCol: String, l: Column, r: Column): Column =
    l <= col(tsCol) && col(tsCol) <= r

  /** Chronological-order validator (time.rs:129-153): rows where the
    * timestamp regresses w.r.t. the previous event of the same case.
    * Returns the offending rows (empty ⇒ valid).
    */
  def orderViolations(events: DataFrame, caseCol: String, tsCol: String,
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tieBreak))
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .filter(col("_prev_ts").isNotNull && col(tsCol) < col("_prev_ts"))
      .drop("_prev_ts")
  }
}
