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
}
