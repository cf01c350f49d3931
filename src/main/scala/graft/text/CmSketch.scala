package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Count-min sketch — frequency estimation in d·w cells regardless of
  * vocabulary size (the heavy-hitter / frequency primitive for corpora
  * whose token tables don't fit anywhere). Deterministic by
  * construction, unlike Misra-Gries-style summaries whose contents
  * depend on arrival order: cells are plain SUMS over portable hash
  * buckets (order- and partition-free), so the sketch and every
  * estimate hash-gate bit-equal against the SQL oracle.
  *
  * Estimates never undercount (est ≥ true; equality unless the token
  * collides with mass in ALL d rows — the standard CM guarantee,
  * spec-pinned).
  *
  * Scale shape: d map-side hash projections unioned → ONE groupBy of
  * at most d·w cells (map-side partial sums do the heavy lifting);
  * estimation is a broadcast-sized join of probes × d rows against
  * the cell table.
  */
object CmSketch {

  /** Bucket of `token` in hash row `r`: portable charHash with a
    * per-row seed, reduced mod w. */
  def bucket(token: Column, r: Int, w: Int, seed: Long): Column =
    pmod(NativeExpressions.charHash(token, seed + r), lit(w.toLong)).cast("int")

  /** The (row, bucket, n) cell table over an exploded token column. */
  def sketch(tokens: DataFrame, tokenCol: String, d: Int, w: Int,
      seed: Long): DataFrame =
    (0 until d).map { r =>
      tokens.select(lit(r).as("row"),
        bucket(col(tokenCol), r, w, seed).as("bucket"))
    }.reduce(_ unionAll _)
      .groupBy("row", "bucket").agg(count(lit(1)).as("n"))

  /** Point estimates for `probes` (one string column `token`): min
    * over rows of the bucket count, 0 for tokens hashing only to empty
    * buckets. */
  def estimate(cells: DataFrame, probes: DataFrame, d: Int, w: Int,
      seed: Long): DataFrame = {
    val probed = (0 until d).map { r =>
      probes.select(col("token"), lit(r).as("row"),
        bucket(col("token"), r, w, seed).as("bucket"))
    }.reduce(_ unionAll _)
    probed.join(cells, Seq("row", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }
}
