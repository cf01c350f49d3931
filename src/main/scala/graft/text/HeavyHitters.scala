package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed heavy hitters without a full-vocabulary shuffle —
  * the two-pass Misra-Gries scheme every profiling pipeline needs at
  * 100 TB: find all items occurring in ≥ `ppm` parts-per-million of a
  * token/shingle stream whose distinct universe is far too large to
  * group-by (a trillion-shingle corpus would shuffle the whole
  * vocabulary just to discard 99.99% of it).
  *
  * Pass 1 (candidates): per-partition weighted Misra-Gries summaries
  * with `k` counters, reduced through a 3-level merge tree (partition
  * summaries → 32-way weighted re-summarize → one global k-summary),
  * so at most `k` candidate items exist REGARDLESS of partition count
  * — broadcastable at any scale. MG is a mergeable summary (Agarwal
  * et al., PODS'12): every level only ever UNDERCOUNTS, by at most
  * N/(k+1) total, so any item with true count > N/(k+1) keeps a
  * positive counter through every merge and reaches the candidate
  * set. With the static precondition `k+1 > 10⁶/ppm` the threshold
  * `ceil(N·ppm/10⁶)` strictly exceeds N/(k+1) at every N — the
  * candidate set is a SUPERSET of the answer by construction, never
  * by luck.
  *
  * Pass 2 (exactness): re-count ONLY the ≤ k candidates (broadcast
  * semi-filter, then an ordinary group-by whose shuffle is bounded by
  * k·partitions rows) and keep those with exact count ≥ threshold.
  * Borderline candidates that merge order happened to retain are
  * filtered out here, so the OUTPUT is deterministic — exact counts
  * of exactly the ≥-threshold items — even though the intermediate
  * sketch is partitioning-dependent (spec-pinned under 1 vs 16
  * partitions).
  *
  * Cost: one count() of the stream (threshold), one sketch scan, one
  * candidate-filtered recount scan. Three scans and a k-bounded
  * shuffle versus one scan and a VOCABULARY-sized shuffle — the trade
  * every heavy-hitter deployment makes.
  */
object HeavyHitters {

  /** Weighted Misra-Gries fold: at most `k` counters survive; each
    * eviction event subtracts the same mass from ≥ k+1 counters, so
    * the total undercount over the whole stream is ≤ (input weight)
    * / (k+1). Pure function of the input ORDER it is given — callers
    * rely only on the undercount bound, never on which borderline
    * items survive.
    */
  /** Incremental weighted MG state with `k` counters — the fold
    * behind [[mgMerge]], exposed so the per-group variant can keep one
    * sketch per group key in a single partition pass, and so the
    * streaming twin ([[graft.streaming.StreamingHeavyHitters]]) can
    * hold it as keyed state. */
  private[graft] final class MgSketch(k: Int) {
    private val m = new java.util.HashMap[String, Long](k * 2)
    def add(s: String, w: Long): Unit = {
      val cur = m.getOrDefault(s, 0L)
      m.put(s, cur + w)
      if (m.size > k) {
        var minV = Long.MaxValue
        val vit = m.values().iterator()
        while (vit.hasNext) { val v = vit.next(); if (v < minV) minV = v }
        val eit = m.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= minV) eit.remove()
          else e.setValue(e.getValue - minV)
        }
      }
    }
    /** Copied out: the HashMap must not be mutated under a lazy iterator. */
    def entries: Vector[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue)).toVector
    }
  }

  private[text] def mgMerge(it: Iterator[(String, Long)], k: Int): Iterator[(String, Long)] = {
    val sk = new MgSketch(k)
    it.foreach { case (s, w) => sk.add(s, w) }
    sk.entries.iterator
  }

  /** Exact `(item, n)` for every item with count ≥ ceil(N·ppm/10⁶),
    * where N is the stream length. `itemExpr` is evaluated once into
    * a string column. `k` must satisfy `k+1 > 10⁶/ppm` (statically
    * checked) or the candidate superset guarantee fails.
    *
    * EAGERNESS: runs the sketch job at plan-construction time — the
    * exact stream length N rides the merge tree as null-item rows
    * (the [[sketchHeavyHitters]] convention), so the threshold is a
    * literal in the returned plan and the candidates a collected
    * (k-bounded, broadcastable) local table. TWO data scans total
    * (sketch + recount); the r17 optimization removed the third scan
    * that previously computed N alone — on a shingle stream each scan
    * re-pays the tokenize+explode, the family's dominant cost.
    */
  def exactHeavyHitters(rows: DataFrame, itemExpr: Column, ppm: Int,
      k: Int = 1 << 15): DataFrame = {
    require(ppm >= 1 && ppm <= 1000000, s"ppm out of range: $ppm")
    require(k + 1L > 1000000L / ppm,
      s"k=$k breaks the superset guarantee for ppm=$ppm: need k+1 > 1e6/ppm")
    val spark = rows.sparkSession
    import spark.implicits._
    val items = rows.select(itemExpr.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val lvl1 = items.as[String].mapPartitions { it =>
      val sk = new MgSketch(k); var n = 0L
      it.foreach { s => sk.add(s, 1L); n += 1L }
      Iterator.single((null: String, n)) ++ sk.entries.iterator
    }
    // repartition (real shuffle boundaries), NOT coalesce: coalesce(1)
    // would collapse the level-2 stage into the same single task and
    // the "32-way re-summarize" would run serially over all k·P
    // level-1 rows — exactly the bottleneck the tree exists to avoid
    val lvl2 = lvl1.repartition(32).mapPartitions(it => mgMergeN(it, k))
    // ≤ k+1 rows: the global candidate summary plus the exact N row
    val merged = lvl2.repartition(1).mapPartitions(it => mgMergeN(it, k))
      .collect()
    val n = merged.collectFirst { case (null, c) => c }.getOrElse(0L)
    val cands = merged.collect { case (s, _) if s != null => s }
      .toSeq.toDF("item")
    // ceil(n*ppm/1e6) without i64 overflow at any n (n·ppm can breach
    // 2⁶³ on a 100 TB token stream): split n = q·10⁶ + r.
    val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
    items.join(broadcast(cands), "item")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
  }

  /** ONE-PASS approximate heavy hitters — the NO-SECOND-SCAN member of
    * the family, for the regime [[exactHeavyHitters]] can't serve: a
    * source that cannot be scanned twice (short-retention stream, a
    * one-shot pipe) or a pipeline that won't pay the recount. ONE scan
    * of the data: each partition folds its substream into a k-counter
    * MG summary AND its exact row count; summaries and counts reduce
    * through the same 3-level merge tree as the exact kernel (counts
    * ride the tree as null-item rows — count-additive, so any routing
    * is sound). The final stage knows the EXACT stream length N, so it
    * applies the sound prune cutoff `ceil(N·ppm/10⁶) − ⌊N/(k+1)⌋`
    * in-sketch: every item with true count ≥ the threshold keeps a
    * counter ≥ cutoff (the merged-MG undercount is ≤ N/(k+1), Agarwal
    * et al. PODS'12), so the output is a SUPERSET of the exact heavy
    * set, each row carrying a certified LOWER BOUND on its true count
    * (MG only ever undercounts). Which borderline items appear is
    * merge-order-dependent — gates hash [[mgAudit]]'s deterministic
    * certificate, never this row set (the quantile-sketch rule,
    * ops/SketchQuantiles).
    *
    * @return (item, w_lower, n_total): the pruned candidate superset
    *         with per-item lower bounds and the exact stream length
    */
  def sketchHeavyHitters(rows: DataFrame, itemExpr: Column, ppm: Int,
      k: Int = 1 << 14): DataFrame = {
    require(ppm >= 1 && ppm <= 1000000, s"ppm out of range: $ppm")
    require(k + 1L > 1000000L / ppm,
      s"k=$k breaks the superset guarantee for ppm=$ppm: need k+1 > 1e6/ppm")
    val spark = rows.sparkSession
    import spark.implicits._
    val items = rows.select(itemExpr.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val lvl1 = items.as[String].mapPartitions { it =>
      val sk = new MgSketch(k); var n = 0L
      it.foreach { s => sk.add(s, 1L); n += 1L }
      Iterator.single((null: String, n)) ++ sk.entries.iterator
    }
    // same tree discipline as the exact kernel: real repartition
    // boundaries, never coalesce (see exactHeavyHitters)
    val lvl2 = lvl1.repartition(32).mapPartitions(it => mgMergeN(it, k))
    lvl2.repartition(1).mapPartitions { it =>
      val sk = new MgSketch(k); var n = 0L
      it.foreach { case (s, w) => if (s == null) n += w else sk.add(s, w) }
      val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
      val cutoff = thr - n / (k + 1L)
      sk.entries.iterator.collect {
        case (s, w) if w >= cutoff => (s, w, n)
      }
    }.toDF("item", "w_lower", "n_total")
  }

  /** [[mgMerge]] with the stream-length rows threaded through: null
    * items are exact partition counts — summed and re-emitted as one
    * null row, never folded into the sketch. */
  private def mgMergeN(it: Iterator[(String, Long)], k: Int)
      : Iterator[(String, Long)] = {
    val sk = new MgSketch(k); var n = 0L
    it.foreach { case (s, w) => if (s == null) n += w else sk.add(s, w) }
    Iterator.single((null: String, n)) ++ sk.entries.iterator
  }

  /** Deterministic certificate for a one-pass MG estimate (the
    * heavy-hitters twin of SketchQuantiles.rankAudit): recomputes the
    * EXACT heavy set (full-vocabulary group-by — this verification
    * scan is the CERTIFICATION, not the operator) and, per true heavy
    * item, checks the three facts the MG proof forces to hold under
    * ANY merge order or batching:
    *   found          — the item is in the estimate (superset),
    *   lower_le_exact — its w_lower never overcounts,
    *   gap_le_bound   — its undercount is ≤ ⌊N/(k+1)⌋.
    * The output is a pure function of the DATA (exact counts, exact N,
    * the a-priori bound recomputed with the same integer arithmetic,
    * three flags that are deterministically TRUE), so it hashes
    * stably even though `est`'s borderline rows are merge-order
    * dependent. `est` may carry one row per flushed segment of an
    * item's substream (the streaming fold re-opens buckets on late
    * data): segment lower bounds are summed — each segment's MG
    * undercounts its own slice, so the sum still lower-bounds the
    * total and the per-slice gaps still sum to ≤ ⌊N/(k+1)⌋.
    *
    * @param est (item, w_lower) rows from [[sketchHeavyHitters]] or
    *            the streaming fold's flushed candidates
    * @return one row per EXACT heavy item:
    *         (item, n_exact, n_total, err_bound_cnt, found,
    *          lower_le_exact, gap_le_bound)
    */
  def mgAudit(rows: DataFrame, itemExpr: Column, est: DataFrame,
      ppm: Int, k: Int): DataFrame =
    mgAudit(rows, itemExpr, est, ppm, k, None)

  /** [[mgAudit]] with the exact stream length supplied by the caller
    * (r17): when the estimating pass already knows N exactly (the
    * one-pass sketch's null-row count, the streaming fold's per-flush
    * bucket totals), recounting it here would re-pay a full scan of
    * the stream — on the shingle gates that scan re-runs the
    * tokenize+explode, the single largest cost in the audit. A wrong
    * `nTotal` cannot pass silently: n_total/err_bound_cnt are hashed
    * against the oracle's own exact count. */
  def mgAudit(rows: DataFrame, itemExpr: Column, est: DataFrame,
      ppm: Int, k: Int, nTotal: Option[Long]): DataFrame = {
    require(ppm >= 1 && ppm <= 1000000, s"ppm out of range: $ppm")
    require(k + 1L > 1000000L / ppm,
      s"k=$k breaks the superset guarantee for ppm=$ppm: need k+1 > 1e6/ppm")
    val items = rows.select(itemExpr.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val n = nTotal.getOrElse(items.count())
    val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
    val bound = n / (k + 1L)
    val cand = est.groupBy("item").agg(sum("w_lower").as("w_lower"))
    items.groupBy("item").agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= thr)
      .join(broadcast(cand), Seq("item"), "left")
      .select(col("item"), col("n_exact"),
        lit(n).as("n_total"), lit(bound).as("err_bound_cnt"),
        col("w_lower").isNotNull.as("found"),
        // null-safe: an item the estimate MISSED fails all three flags
        // (rather than nulling them) — the doctored-estimate detection
        // the spec pins
        coalesce(col("w_lower") <= col("n_exact"), lit(false))
          .as("lower_le_exact"),
        coalesce(col("n_exact") - col("w_lower") <= lit(bound), lit(false))
          .as("gap_le_bound"))
  }

  /** PER-GROUP exact heavy hitters — items at ≥ `ppm` of THEIR GROUP's
    * stream (heavy shingles per language / per domain, the
    * mixture-pipeline variant). Same two-pass scheme per group: each
    * group's per-partition substream gets its own MG sketch (memory ≤
    * k × groups per partition — group cardinality must be bounded,
    * the same contract as every per-group broadcast in this engine),
    * group summaries merge through a per-group weighted re-summarize
    * (one `groupByKey(group)` pass over ≤ k·P weighted rows per
    * group), and the ≤ k·|groups| candidates broadcast into an exact
    * recount. The per-group threshold `ceil(N_g·ppm/10⁶)` derives
    * from exact group lengths that ride the summaries as null-item
    * rows (k·|groups|-bounded collect — the same boundedness contract
    * as the candidate broadcast), with the same overflow-safe integer
    * split.
    *
    * @return (group, item, n) — exact counts of exactly the items at
    *         ≥ ppm of their group
    */
  def exactHeavyHittersByGroup(rows: DataFrame, groupExpr: Column,
      itemExpr: Column, ppm: Int, k: Int = 1 << 15): DataFrame = {
    require(ppm >= 1 && ppm <= 1000000, s"ppm out of range: $ppm")
    require(k + 1L > 1000000L / ppm,
      s"k=$k breaks the superset guarantee for ppm=$ppm: need k+1 > 1e6/ppm")
    val spark = rows.sparkSession
    import spark.implicits._
    val items = rows.select(groupExpr.cast("string").as("grp"),
        itemExpr.cast("string").as("item"))
      .filter(col("grp").isNotNull && col("item").isNotNull)
    // exact per-group lengths ride the per-partition summaries as
    // null-item rows (the sketchHeavyHitters convention), so the
    // per-group thresholds come out of the SAME scan as the
    // candidates — previously a third full scan recounted them (r17;
    // on shingle streams each scan re-pays the tokenize+explode)
    val lvl1 = items.as[(String, String)].mapPartitions { it =>
      val sketches = scala.collection.mutable.HashMap.empty[String, MgSketch]
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (g, s) =>
        sketches.getOrElseUpdate(g, new MgSketch(k)).add(s, 1L)
        counts.update(g, counts.getOrElse(g, 0L) + 1L)
      }
      counts.iterator.map { case (g, n) => (g, null: String, n) } ++
        sketches.iterator.flatMap { case (g, sk) =>
          sk.entries.map { case (s, w) => (g, s, w) }
        }
    }
    // ≤ (k+1)·|groups| rows after the per-group merge — collected so
    // the candidate table and the threshold table come from ONE job
    val merged = lvl1.groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        var n = 0L
        val sk = new MgSketch(k)
        it.foreach { case (_, s, w) => if (s == null) n += w else sk.add(s, w) }
        Iterator.single((g, null: String, n)) ++
          sk.entries.iterator.map { case (s, _) => (g, s, 0L) }
      }.collect()
    val cands = merged.collect { case (g, s, _) if s != null => (g, s) }
      .toSeq.toDF("grp", "item")
    val totals = merged.collect { case (g, null, n) => (g, n) }
      .toSeq.toDF("grp", "_ng")
    items.join(broadcast(cands), Seq("grp", "item"))
      .groupBy("grp", "item").agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "grp")
      .filter(col("n") >= expr(
        s"(_ng div 1000000) * $ppm + ((_ng % 1000000) * $ppm + 999999) div 1000000"))
      .select(col("grp"), col("item"), col("n"))
  }
}
