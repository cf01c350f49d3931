package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Exact substring-span deduplication — finds the MAXIMAL duplicated
  * character spans across documents, not just which documents look
  * alike (the span-level variant of training-data dedup: repeated
  * boilerplate/quotes inflate loss on memorized spans even when the
  * containing documents are unique).
  *
  * Algorithm (all relational, two shuffles):
  *  1. every k-gram hash with its position — a map-side native rolling
  *     kernel ([[NativeExpressions.gramHashes]]), O(len) per doc;
  *  2. inverted index on the gram hash (shuffle 1, groupBy) with a
  *     `maxDf` hub cutoff — stop-grams shared by everything would
  *     expand quadratically, the same skew trick as
  *     [[Dedup.jaccardPairs]];
  *  3. in-bucket pair expansion (≤ maxDf² per gram, ids+positions
  *     only — no text moves);
  *  4. the diagonal-run merge: matched positions of one contiguous
  *     common substring share `pos_a - pos_b` and are consecutive in
  *     `pos_a`, so gaps-and-islands over (pair, diagonal) (shuffle 2,
  *     window) yields each maximal span in closed form —
  *     span_len = max(pos_a) - min(pos_a) + k.
  *
  * Equality is by polynomial hash (the same charHash the DuckDB
  * oracle replicates): a false span needs a 10^9-modulus collision at
  * matching diagonals — rare, and the gate is exact because the
  * oracle uses the identical hash. At 100 TB: gram volume is
  * sum(len), both shuffles carry fixed-width (id, pos, hash) rows,
  * candidate volume is linear in true duplication mass + hub-bounded
  * collisions — never |corpus|².
  */
object SpanDedup {

  /** Maximal shared spans ≥ `minLen` code points between distinct
    * docs: (id_a, id_b, start_a, start_b, span_len), ids ordered
    * id_a < id_b, positions 0-based. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minLen: Int, maxDf: Long): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= k ($k)")
    val grams = docs.select(col(idCol).cast("long").as("_id"),
      posexplode(NativeExpressions.gramHashes(col(textCol), k))
        .as(Seq("_pos", "_g")))
    val occs = grams.groupBy("_g")
      .agg(count(lit(1)).as("_df"),
        collect_list(struct(col("_id"), col("_pos"))).as("_occ"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf) // singletons pair with nothing
    val pairs = occs
      .select(explode(col("_occ")).as("_a"), col("_occ"))
      .select(col("_a"), explode(col("_occ")).as("_b"))
      .filter(col("_a._id") < col("_b._id"))
      .select(col("_a._id").as("id_a"), col("_b._id").as("id_b"),
        col("_a._pos").cast("long").as("pos_a"),
        col("_b._pos").cast("long").as("pos_b"))
    val diag = pairs.withColumn("_diag", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("_diag"))
      .orderBy(col("pos_a"))
    diag
      .withColumn("_isl", col("pos_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("_diag"), col("_isl"))
      .agg(min(col("pos_a")).as("start_a"), max(col("pos_a")).as("_end"))
      .withColumn("span_len", col("_end") - col("start_a") + lit(k.toLong))
      .filter(col("span_len") >= minLen)
      .select(col("id_a"), col("id_b"), col("start_a"),
        (col("start_a") - col("_diag")).as("start_b"), col("span_len"))
  }

  /** Per-document duplicated-character count: the size of the UNION of
    * all spans (either side) touching the doc — the signal span-aware
    * filters threshold on ("drop docs that are >X% boilerplate").
    * Interval union per doc is one more gaps-and-islands window over
    * span starts (runs split where a span starts past the running max
    * end); docs with no spans are absent (join back as 0 upstream if
    * needed). */
  def spanCoverage(spans: DataFrame): DataFrame = {
    val sides = spans.select(col("id_a").as("doc_id"),
        col("start_a").as("_s"), (col("start_a") + col("span_len")).as("_e"))
      .unionByName(spans.select(col("id_b").as("doc_id"),
        col("start_b").as("_s"), (col("start_b") + col("span_len")).as("_e")))
      .distinct()
    val wOrd = Window.partitionBy(col("doc_id"))
      .orderBy(col("_s"), col("_e"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    sides
      .withColumn("_prevMax", max(col("_e")).over(wRun))
      .withColumn("_new",
        when(col("_prevMax").isNull || col("_s") > col("_prevMax"), 1L)
          .otherwise(0L))
      .withColumn("_grp", sum(col("_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("_s")).as("_us"), max(col("_e")).as("_ue"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_ue") - col("_us")).as("dup_chars"))
  }
}
