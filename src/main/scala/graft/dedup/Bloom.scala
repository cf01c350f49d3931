package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Bloom-filter membership sketch over a content-hash column — the
  * constant-size "have we seen this content before?" structure that
  * turns a 100 TB anti-join against a reference snapshot into a
  * broadcast of m/8 bytes. False positives are possible, false
  * negatives are not; with the portable hash family both engines set
  * and probe EXACTLY the same bits, so even the false-positive set is
  * bit-deterministic (the gate contract).
  *
  * Layout: `mBits` bits stored as 32-bit words inside i64 columns
  * (bit 31 is the highest ever set, so no sign/overflow edge cases in
  * either engine); position i of key x is ihash(x, i, seed) mod mBits,
  * word = pos div 32, mask = 1 << (pos mod 32).
  *
  * Scale shape: the build side folds to ≤ mBits/32 rows via a
  * `bit_or` group-by (map-side partial merge, order-free) and is then
  * BROADCAST; the probe side is one map-side position expansion (k
  * rows per doc) joined against the broadcast words and re-grouped by
  * doc — one doc-keyed shuffle total, nothing driver-side.
  *
  * Capability direction: the sketch family beside
  * [[graft.functions.HllSketch]] / [[graft.text.CmSketch]]; subsumes
  * the reference's seen-before dedup gate (SURVEY.md §2.7
  * Validator/dedup surface, /root/reference/src/stream/validator.rs:19).
  */
object Bloom {

  /** k probe positions (array of i64 bit positions) for key column x.
    * The streaming build twin projects the SAME arithmetic in-plan via
    * [[streamWordMasks]] — one source of truth for the bit layout. */
  private def positions(x: Column, kHashes: Int = 4, mBits: Int = 65536,
      seed: Long = 42L): Column =
    array((0 until kHashes).map { i =>
      pmod(Portable.ihash(x, i, seed), lit(mBits.toLong))
    }: _*)

  private val maskExpr =
    "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"

  /** The streaming build's (word, mask, tsMicros) projection — ONE
    * source of truth for the bit layout shared by the parity gate, the
    * scale harness, and the spec: explode keyCol's k positions for
    * data rows; rows matching `sentinel` route to word = -1 / mask = 0
    * so the stateful fold drops them after they advance the watermark.
    * `df` must carry a `tsMicros` column; `sentinel` is evaluated
    * against `df`'s columns before the projection narrows them. */
  def streamWordMasks(df: DataFrame, keyCol: Column, sentinel: Column,
      kHashes: Int = 4, mBits: Int = 65536, seed: Long = 42L): DataFrame =
    df.select(explode(when(sentinel, array(lit(-1L)))
        .otherwise(positions(keyCol, kHashes, mBits, seed))).as("pos"),
        col("tsMicros"))
      .selectExpr(
        "CASE WHEN pos < 0 THEN CAST(-1 AS BIGINT) ELSE pos div 32 END AS word",
        s"CASE WHEN pos < 0 THEN CAST(0 AS BIGINT) ELSE $maskExpr END AS mask",
        "tsMicros")

  /** Build the filter: ≤ mBits/32 rows of (word: long, bits: long). */
  def build(ref: DataFrame, keyCol: Column, kHashes: Int = 4,
            mBits: Int = 65536, seed: Long = 42L): DataFrame =
    ref.select(explode(positions(keyCol, kHashes, mBits, seed)).as("pos"))
      .groupBy(expr("pos div 32").as("word"))
      .agg(expr(s"bit_or($maskExpr)").as("bits"))

  /** Probe: for each row of `docs`, true iff ALL k positions of
    * keyCol are set in `words`. Output (idCol, maybe_in_ref).
    */
  def probe(docs: DataFrame, idCol: String, keyCol: Column, words: DataFrame,
            kHashes: Int = 4, mBits: Int = 65536, seed: Long = 42L): DataFrame =
    docs.select(col(idCol), explode(positions(keyCol, kHashes, mBits, seed)).as("pos"))
      .withColumn("word", expr("pos div 32"))
      .withColumn("mask", expr(maskExpr))
      .join(broadcast(words), Seq("word"), "left")
      .select(col(idCol),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0L).as("hit"))
      .groupBy(idCol)
      .agg((sum(when(col("hit"), 1L).otherwise(0L)) === lit(kHashes.toLong))
        .as("maybe_in_ref"))

  /** Oracle SQL fragments: the k (word, mask) expression pairs of key
    * SQL expression `x` — same arithmetic as [[positions]], `//` for
    * `div`. Query modules compose these into build + probe CTEs.
    */
  def positionsSql(x: String, kHashes: Int, mBits: Int, seed: Long): Seq[(String, String)] =
    (0 until kHashes).map { i =>
      val h = Portable.ihashSql(x, i, seed)
      val pos = s"((($h) % $mBits + $mBits) % $mBits)"
      (s"(($pos) // 32)", s"(CAST(1 AS BIGINT) << CAST(($pos) % 32 AS INTEGER))")
    }
}
