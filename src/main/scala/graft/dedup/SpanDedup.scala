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
    * id_a < id_b, positions 0-based.
    *
    * With `includeSelf = true`, SAME-doc repeats are matched too
    * (id_a = id_b, pos_a < pos_b): each maximal intra-doc repetition
    * surfaces as a span whose later occurrence starts at start_b —
    * the Gopher-style repetition REMOVAL signal (periodic text like
    * "abc abc abc" yields one long off-diagonal span; scrubbing its
    * id_b side keeps exactly the first period). */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minLen: Int, maxDf: Long,
      includeSelf: Boolean = false): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= k ($k)")
    val grams = docs.select(col(idCol).cast("long").as("_id"),
      posexplode(NativeExpressions.gramHashes(col(textCol), k))
        .as(Seq("_pos", "_g")))
    // Single-pass hub cutoff: a size-capped occurrence-list aggregate
    // ([[graft.functions.CappedOccList]]) collects at most maxDf+1
    // (id, pos) entries per gram and evals to NULL outside [2, maxDf]
    // (singletons pair with nothing; past maxDf it's a stop-gram).
    // Buffers are O(maxDf) even for a boilerplate gram with millions
    // of occurrences, and map-side partial merge caps the SHUFFLE at
    // maxDf+1 entries per gram per map partition — strictly less data
    // moved than the previous two-pass df-filter + semi-join shape,
    // and one full gram scan + kernel pass + exchange cheaper.
    val occs = grams.groupBy("_g")
      .agg(graft.functions.CappedOccList(col("_id"), col("_pos"),
        maxDf.toInt).as("_occ"))
      .filter(col("_occ").isNotNull)
    val keep =
      if (includeSelf)
        col("_a._id") < col("_b._id") ||
          (col("_a._id") === col("_b._id") && col("_a._pos") < col("_b._pos"))
      else col("_a._id") < col("_b._id")
    val pairs = occs
      .select(explode(col("_occ")).as("_a"), col("_occ"))
      .select(col("_a"), explode(col("_occ")).as("_b"))
      .filter(keep)
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

  /** Interval UNION per doc — merge overlapping/adjacent (s, e) rows
    * into disjoint (doc_id, _us, _ue) intervals: one gaps-and-islands
    * window over starts (an island breaks where a start exceeds the
    * running max end). */
  private def mergedIntervals(sides: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id"))
      .orderBy(col("_s"), col("_e"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    sides.distinct()
      .withColumn("_prevMax", max(col("_e")).over(wRun))
      .withColumn("_new",
        when(col("_prevMax").isNull || col("_s") > col("_prevMax"), 1L)
          .otherwise(0L))
      .withColumn("_grp", sum(col("_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("_s")).as("_us"), max(col("_e")).as("_ue"))
      .select("doc_id", "_us", "_ue")
  }

  /** Per-document duplicated-character count: the size of the UNION of
    * all spans (either side) touching the doc — the signal span-aware
    * filters threshold on ("drop docs that are >X% boilerplate").
    * Docs with no spans are absent (join back as 0 upstream if
    * needed). */
  def spanCoverage(spans: DataFrame): DataFrame = {
    // span list materialized ONCE (r17): the two union sides otherwise
    // each re-derive the whole upstream span pipeline (gram explode +
    // capped occ-list + pair windows). Span rows are few — the dup
    // signal, not the corpus.
    val sp = spans.localCheckpoint(true)
    val sides = sp.select(col("id_a").as("doc_id"),
        col("start_a").as("_s"), (col("start_a") + col("span_len")).as("_e"))
      .unionByName(sp.select(col("id_b").as("doc_id"),
        col("start_b").as("_s"), (col("start_b") + col("span_len")).as("_e")))
    mergedIntervals(sides)
      .groupBy(col("doc_id"))
      .agg(sum(col("_ue") - col("_us")).as("dup_chars"))
  }

  /** Span-scrubbed corpus (the Lee et al. "deduplicating training data"
    * transformation): every duplicated span keeps its EARLIEST
    * occurrence (smallest doc_id = the span pair's id_a side) and is
    * deleted from every later doc — so `spans`' id_b-side intervals
    * are cut out of their docs and the surviving text re-concatenated.
    * Intra-doc repeats are out of scope (spans are cross-doc by
    * construction). Returns every doc: (idCol, clean_text) — untouched
    * docs pass through whole, fully-duplicated docs come back empty.
    *
    * Shape: merged cut-intervals per doc (window over span rows, tiny),
    * complement segments via one lag window + per-doc tail row, then
    * ONE equi-join back to the text and an ordered concat per doc —
    * text moves through exactly one shuffle. */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    // NOTE (r17): deliberately NOT materialized. A localCheckpoint
    // here (tried for the gap/tail double derivation) forces the span
    // pipeline to fully evaluate at plan construction, defeating the
    // column pruning a bounded consumer gets on the lazy plan — the
    // bench's count-mode scrub gates regressed 0.3 s → 2.5-3.8 s.
    val cuts = mergedIntervals(spans.select(col("id_b").as("doc_id"),
      col("start_b").as("_s"), (col("start_b") + col("span_len")).as("_e")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("_us"))
    // complement of the cuts: the gap before each cut + the tail after
    // the last cut (tail end = null -> clamped to the doc length below)
    val gaps = cuts
      .withColumn("_ss", coalesce(lag(col("_ue"), 1).over(wd), lit(0L)))
      .select(col("doc_id"), col("_ss"), col("_us").as("_se"))
    val tails = cuts.groupBy(col("doc_id"))
      .agg(max(col("_ue")).as("_ss"))
      .withColumn("_se", lit(null).cast("long"))
    val segs = gaps.unionByName(tails)
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val cleaned = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("_text"))
      .join(segs, Seq("doc_id"), "left")
      .withColumn("_len", length(col("_text")).cast("long"))
      // doc with no cuts: one whole-text segment [0, len)
      .withColumn("_ss", coalesce(col("_ss"), lit(0L)))
      .withColumn("_se", coalesce(col("_se"), col("_len")))
      .filter(col("_se") > col("_ss"))
      .withColumn("_piece", expr("substring(_text, cast(_ss + 1 as int), cast(_se - _ss as int))"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("_ss"), col("_piece"))))
        .getField("_piece")).as("clean_text"))
    // fully-covered (and empty) docs have no surviving segment: empty
    ids.join(cleaned, Seq("doc_id"), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }
}
