package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the greatest right
  * timestamp ≤ the left timestamp within the same key (the canonical
  * "latest quote before each trade" operator; Spark has no builtin).
  *
  * Implementation is the union-window trick, not a range join: tag
  * both inputs, union them, and take a running `max(right ts)` over
  * one window partitioned by key and ordered by (ts, side) — right
  * rows sort before left rows at equal timestamps, giving inclusive
  * `≤` semantics. ONE shuffle on the key, no per-key quadratic
  * expansion, no range-condition join — the plan that survives a hot
  * key with millions of rows on both sides (DuckDB's native ASOF JOIN
  * is the oracle for it).
  *
  * Tie policy: at equal right timestamps only the timestamp is
  * emitted (identical for all tied rows), so the result is total-order
  * deterministic without an arbitrary pick among ties.
  */
object AsOf {

  /** Left rows + `asof_ts`: the matched right timestamp (null when no
    * right row precedes). `left` must carry (keyCol, idCol, tsCol);
    * `right` (keyCol, tsCol). */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      idCol: String, tsCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(idCol), col(tsCol).as("_ts"),
      lit(1).as("_side"))
    val r = right.select(col(keyCol), lit(null).cast(l.schema(idCol).dataType).as(idCol),
      col(tsCol).as("_ts"), lit(0).as("_side"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("asof_ts",
        max(when(col("_side") === 0, col("_ts"))).over(w))
      .filter(col("_side") === 1)
      .select(col(keyCol), col(idCol), col("_ts").as(tsCol), col("asof_ts"))
  }

  /** Both running extremes over ONE union and ONE window ordering —
    * the shared kernel of [[forward]] and [[nearest]]. Emits left rows
    * with `_bwd` (greatest right ts ≤ left ts, null if none) and
    * `_fwd` (smallest right ts ≥ left ts AND ≤ left ts + horizonUs,
    * null if none in the window). tsCol must be a TIMESTAMP column.
    *
    * The horizon is part of the operator contract, not a convenience:
    * unbounded LOOKBACK streams (the past compacts to one long,
    * [[graft.streaming.StreamingAsOf]]), but unbounded LOOKAHEAD
    * cannot — "no following right row" is never final while the
    * stream lives, so the forward flavor that scales to an unbounded
    * stream is "first right row within H", and the batch operator
    * carries the same H so the twins share one oracle verbatim.
    *
    * Same plan shape as [[backward]]: ONE shuffle on the key, two
    * running aggregates over the same sort (right rows sort before
    * left at equal ts; the frame starting AT the left row therefore
    * sees only right rows strictly after it, and the equal-ts case is
    * recovered from `_bwd == ts`, which holds iff a right row sits at
    * exactly the left ts). */
  private def bothExtremes(left: DataFrame, right: DataFrame,
      keyCol: String, idCol: String, tsCol: String,
      horizonUs: Long): DataFrame = {
    require(horizonUs >= 0L, s"horizon must be >= 0 us: $horizonUs")
    val l = left.select(col(keyCol), col(idCol), col(tsCol).as("_ts"),
      lit(1).as("_side"))
    val r = right.select(col(keyCol), lit(null).cast(l.schema(idCol).dataType).as(idCol),
      col(tsCol).as("_ts"), lit(0).as("_side"))
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("_ts"), col("_side"))
    val wPast = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFut = ord.rowsBetween(0, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("_bwd",
        max(when(col("_side") === 0, col("_ts"))).over(wPast))
      .withColumn("_fexcl",
        min(when(col("_side") === 0, col("_ts"))).over(wFut))
      .filter(col("_side") === 1)
      .withColumn("_fraw",
        when(unix_micros(col("_bwd")) === unix_micros(col("_ts")), col("_ts"))
          .otherwise(col("_fexcl")))
      .withColumn("_fwd",
        // Saturating ts + horizon, mirroring the streaming twin's
        // safeAdd: a horizon near Long.MaxValue must widen the window
        // to "any following row", not wrap negative (non-ANSI) or
        // throw (ANSI). horizonUs >= 0, so Long.MaxValue - horizonUs
        // is overflow-free on the driver and the guard needs no SQL
        // arithmetic beyond the comparison.
        when(unix_micros(col("_fraw")) <=
          when(unix_micros(col("_ts")) > lit(Long.MaxValue - horizonUs),
            lit(Long.MaxValue))
            .otherwise(unix_micros(col("_ts")) + horizonUs),
          col("_fraw")))
      .select(col(keyCol), col(idCol), col("_ts").as(tsCol),
        col("_bwd"), col("_fwd"))
  }

  /** Forward as-of with a match horizon: left rows + `asof_fwd_ts`,
    * the smallest right timestamp in [left ts, left ts + horizonUs]
    * (null when none — including a following right row beyond the
    * horizon). See [[bothExtremes]] for why the horizon is the
    * contract. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      idCol: String, tsCol: String, horizonUs: Long): DataFrame =
    bothExtremes(left, right, keyCol, idCol, tsCol, horizonUs)
      .select(col(keyCol), col(idCol), col(tsCol),
        col("_fwd").as("asof_fwd_ts"))

  /** Nearest as-of: left rows + `asof_near_ts`, whichever of the
    * backward match (unbounded lookback) and the forward match
    * (lookahead bounded by horizonUs) lies closer in time; equal
    * distance resolves BACKWARD (deterministic; at a right row exactly
    * on the left ts both candidates are that row). Null only when
    * neither side matches. */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String,
      idCol: String, tsCol: String, horizonUs: Long): DataFrame =
    bothExtremes(left, right, keyCol, idCol, tsCol, horizonUs)
      .withColumn("asof_near_ts",
        when(col("_bwd").isNull, col("_fwd"))
          .when(col("_fwd").isNull, col("_bwd"))
          .when(unix_micros(col(tsCol)) - unix_micros(col("_bwd")) <=
            unix_micros(col("_fwd")) - unix_micros(col(tsCol)), col("_bwd"))
          .otherwise(col("_fwd")))
      .select(col(keyCol), col(idCol), col(tsCol), col("asof_near_ts"))
}
