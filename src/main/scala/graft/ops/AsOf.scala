package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Payload columns: every flavor can carry right-row payload columns
  * alongside the matched timestamp (the real enrichment use — "the
  * quote's PRICE at the matched time", not just the time). The payload
  * rides inside the SAME running extreme: the aggregate becomes
  * `max(struct(ts, payload…))` / `min(struct(ts, payload…))` over the
  * identical union window, so the plan is unchanged — one shuffle, one
  * sort, running aggregates — and the matched row's payload fields are
  * projected out of the winning struct.
  *
  * Tie policy (several right rows at the matched timestamp — cannot
  * occur on the gates' data, where (key, ts) is unique per side, but
  * pinned deterministically for any input): struct order decides.
  * [[backward]] takes the greatest (ts, payload…) struct — greatest
  * payload wins; [[forward]] takes the least struct over strictly
  * later rows — least payload wins — except a match at exactly the
  * left timestamp, which is recovered from the backward extreme and so
  * inherits its greatest-payload direction; [[nearest]] compares the
  * two winners by timestamp distance only (equal distance resolves
  * backward) and emits the winning struct's payload.
  */
object AsOf {

  /** The struct-ordered extremes carrier: (ts, payload…) with ts
    * leading so struct order is ts-major. */
  private def matchStruct(tsCol: String, payloadCols: Seq[String]): Column =
    struct((col(tsCol).as("_t") +: payloadCols.map(col)): _*)

  private def payloadOut(src: Column, payloadCols: Seq[String],
      prefix: String): Seq[(String, Column)] =
    payloadCols.map(p => s"$prefix$p" -> src.getField(p))

  /** Left rows + `asof_ts`: the matched right timestamp (null when no
    * right row precedes) + `asof_<p>` for every payload column `p`
    * (the matched right row's values, null likewise). `left` must
    * carry (keyCol, idCol, tsCol); `right` (keyCol, tsCol,
    * payloadCols…). */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      idCol: String, tsCol: String,
      payloadCols: Seq[String] = Nil): DataFrame = {
    val l = left.select(Seq(col(keyCol), col(idCol), col(tsCol).as("_ts"),
      lit(1).as("_side")) ++
      payloadCols.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right.select(Seq(col(keyCol),
      lit(null).cast(l.schema(idCol).dataType).as(idCol),
      col(tsCol).as("_ts"), lit(0).as("_side")) ++ payloadCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = l.unionByName(r)
      .withColumn("_m",
        max(when(col("_side") === 0, matchStruct("_ts", payloadCols))).over(w))
      .filter(col("_side") === 1)
    val outCols =
      Seq(col(keyCol), col(idCol), col("_ts").as(tsCol),
        col("_m").getField("_t").as("asof_ts")) ++
        payloadOut(col("_m"), payloadCols, "asof_").map { case (n, c) => c.as(n) }
    matched.select(outCols: _*)
  }

  /** Both running extremes over ONE union and ONE window ordering —
    * the shared kernel of [[forward]] and [[nearest]]. Emits left rows
    * with `_bwd` (greatest right (ts, payload…) struct with ts ≤ left
    * ts, null if none) and `_fwd` (least struct with ts ≥ left ts AND
    * ≤ left ts + horizonUs, null if none in the window). tsCol must be
    * a TIMESTAMP column.
    *
    * The horizon is part of the operator contract, not a convenience:
    * unbounded LOOKBACK streams (the past compacts to one standing
    * (ts, payload) pair, [[graft.streaming.StreamingAsOf]]), but
    * unbounded LOOKAHEAD cannot — "no following right row" is never
    * final while the stream lives, so the forward flavor that scales
    * to an unbounded stream is "first right row within H", and the
    * batch operator carries the same H so the twins share one oracle
    * verbatim.
    *
    * Same plan shape as [[backward]]: ONE shuffle on the key, two
    * running aggregates over the same sort (right rows sort before
    * left at equal ts; the frame starting AT the left row therefore
    * sees only right rows strictly after it, and the equal-ts case is
    * recovered from `_bwd._t == ts`, which holds iff a right row sits
    * at exactly the left ts — the recovered match carries the backward
    * struct's payload, see the class-doc tie policy). */
  private def bothExtremes(left: DataFrame, right: DataFrame,
      keyCol: String, idCol: String, tsCol: String,
      horizonUs: Long, payloadCols: Seq[String]): DataFrame = {
    require(horizonUs >= 0L, s"horizon must be >= 0 us: $horizonUs")
    val l = left.select(Seq(col(keyCol), col(idCol), col(tsCol).as("_ts"),
      lit(1).as("_side")) ++
      payloadCols.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right.select(Seq(col(keyCol),
      lit(null).cast(l.schema(idCol).dataType).as(idCol),
      col(tsCol).as("_ts"), lit(0).as("_side")) ++ payloadCols.map(col): _*)
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("_ts"), col("_side"))
    val wPast = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFut = ord.rowsBetween(0, Window.unboundedFollowing)
    val ms = matchStruct("_ts", payloadCols)
    l.unionByName(r)
      .withColumn("_bwd", max(when(col("_side") === 0, ms)).over(wPast))
      .withColumn("_fexcl", min(when(col("_side") === 0, ms)).over(wFut))
      .filter(col("_side") === 1)
      .withColumn("_fraw",
        when(unix_micros(col("_bwd").getField("_t")) === unix_micros(col("_ts")),
          col("_bwd"))
          .otherwise(col("_fexcl")))
      .withColumn("_fwd",
        // Saturating ts + horizon, mirroring the streaming twin's
        // safeAdd: a horizon near Long.MaxValue must widen the window
        // to "any following row", not wrap negative (non-ANSI) or
        // throw (ANSI). horizonUs >= 0, so Long.MaxValue - horizonUs
        // is overflow-free on the driver and the guard needs no SQL
        // arithmetic beyond the comparison.
        when(unix_micros(col("_fraw").getField("_t")) <=
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
    * horizon), + `asof_fwd_<p>` payload fields. See [[bothExtremes]]
    * for why the horizon is the contract. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      idCol: String, tsCol: String, horizonUs: Long,
      payloadCols: Seq[String] = Nil): DataFrame =
    bothExtremes(left, right, keyCol, idCol, tsCol, horizonUs, payloadCols)
      .select(Seq(col(keyCol), col(idCol), col(tsCol),
        col("_fwd").getField("_t").as("asof_fwd_ts")) ++
        payloadOut(col("_fwd"), payloadCols, "asof_fwd_")
          .map { case (n, c) => c.as(n) }: _*)

  /** Nearest as-of: left rows + `asof_near_ts`, whichever of the
    * backward match (unbounded lookback) and the forward match
    * (lookahead bounded by horizonUs) lies closer in time; equal
    * distance resolves BACKWARD (deterministic; at a right row exactly
    * on the left ts both candidates are that row), + `asof_near_<p>`
    * payload fields from the winning side. Null only when neither side
    * matches. */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String,
      idCol: String, tsCol: String, horizonUs: Long,
      payloadCols: Seq[String] = Nil): DataFrame = {
    val both =
      bothExtremes(left, right, keyCol, idCol, tsCol, horizonUs, payloadCols)
        .withColumn("_near",
          when(col("_bwd").isNull, col("_fwd"))
            .when(col("_fwd").isNull, col("_bwd"))
            .when(unix_micros(col(tsCol)) -
              unix_micros(col("_bwd").getField("_t")) <=
              unix_micros(col("_fwd").getField("_t")) -
                unix_micros(col(tsCol)), col("_bwd"))
            .otherwise(col("_fwd")))
    both.select(Seq(col(keyCol), col(idCol), col(tsCol),
      col("_near").getField("_t").as("asof_near_ts")) ++
      payloadOut(col("_near"), payloadCols, "asof_near_")
        .map { case (n, c) => c.as(n) }: _*)
  }
}
