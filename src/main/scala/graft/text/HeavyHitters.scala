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
    * EAGERNESS: runs the N-count job at plan-construction time (the
    * threshold is a literal in the returned plan).
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
    val lvl1 = items.as[String]
      .mapPartitions(it => mgMerge(it.map((_, 1L)), k))
      .toDF("item", "_w")
    // repartition (real shuffle boundaries), NOT coalesce: coalesce(1)
    // would collapse the level-2 stage into the same single task and
    // the "32-way re-summarize" would run serially over all k·P
    // level-1 rows — exactly the bottleneck the tree exists to avoid
    val lvl2 = lvl1.repartition(32).as[(String, Long)]
      .mapPartitions(it => mgMerge(it, k))
    val cands = lvl2.repartition(1)
      .mapPartitions(it => mgMerge(it, k))
      .map(_._1).toDF("item")
    val n = items.count()
    // ceil(n*ppm/1e6) without i64 overflow at any n (n·ppm can breach
    // 2⁶³ on a 100 TB token stream): split n = q·10⁶ + r.
    val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
    items.join(broadcast(cands), "item")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
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
    * recount. The per-group threshold `ceil(N_g·ppm/10⁶)` is computed
    * IN-PLAN from a group-count join (no driver collect at all here —
    * unlike the global variant there is no single literal to embed),
    * with the same overflow-safe integer split.
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
    val lvl1 = items.as[(String, String)].mapPartitions { it =>
      val sketches = scala.collection.mutable.HashMap.empty[String, MgSketch]
      it.foreach { case (g, s) =>
        sketches.getOrElseUpdate(g, new MgSketch(k)).add(s, 1L)
      }
      sketches.iterator.flatMap { case (g, sk) =>
        sk.entries.map { case (s, w) => (g, s, w) }
      }
    }
    val cands = lvl1.groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        mgMerge(it.map(r => (r._2, r._3)), k).map { case (s, _) => (g, s) }
      }.toDF("grp", "item")
    val totals = items.groupBy("grp").agg(count(lit(1)).as("_ng"))
    items.join(broadcast(cands), Seq("grp", "item"))
      .groupBy("grp", "item").agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "grp")
      .filter(col("n") >= expr(
        s"(_ng div 1000000) * $ppm + ((_ng % 1000000) * $ppm + 999999) div 1000000"))
      .select(col("grp"), col("item"), col("n"))
  }
}
