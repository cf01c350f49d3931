package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Sampling

/** Streaming twin of the deterministic πps sampler
  * ([[graft.ops.Sampling.sequentialPoisson]]) — the engine's "every
  * operator family has a streaming twin" rule applied to the sampling
  * family. Because the πps priority is a PURE FUNCTION of
  * (id, weight, seed) — the portable integer hash ratio, no RNG state
  * — a weighted sample-without-replacement over an unbounded stream is
  * just a bounded top-k fold: keep the k smallest (priority, id) seen
  * so far. Unlike the heavy-hitters / winsorized twins this needs ONE
  * pass and NO replay: the top-k fold is exact and mergeable, never a
  * sketch.
  *
  * Shape (mirrors the batch kernel's TakeOrdered = per-partition heaps
  * + driver merge of k·partitions rows): items route by
  * `floorMod(id, nBuckets)` into per-bucket keyed state — a bounded
  * heap of ≤ k (priority, id, weight) entries in
  * `flatMapGroupsWithState` — flushed by watermark-driven event-time
  * timeout; the final sample is the k smallest of the ≤ nBuckets·k
  * flushed rows ([[merge]], driver-side on a k·B-bounded set). State
  * is ≤ nBuckets·k rows TOTAL regardless of stream length.
  *
  * Sentinel discipline (the repo's standard): far-future rows remap to
  * `ignoreId` IN a projection and are skipped INSIDE the fold; a
  * data-branch flush covers the sentinel's own bucket whose timer can
  * never fire. Rows with weight < 1 are skipped in the fold — the
  * batch kernel's enforced `weight >= 1` contract (a zero/negative
  * weight breaks the priority arithmetic's engine parity).
  *
  * The priority ([[priorityOf]]) replicates `Sampling.priority`'s
  * integer arithmetic exactly (all terms < 2^51, division truncates on
  * non-negative operands in Scala, Spark `div` and DuckDB `//` alike),
  * so the selected set — and every output bit — matches the batch
  * kernel and its oracle: the gate shares q_sample_weighted's SQL
  * verbatim.
  *
  * [[topKByGroup]]/[[mergeByGroup]] are the stratified twin
  * ([[graft.ops.Sampling.sequentialPoissonByGroup]]): the same fold
  * keyed by (group, bucket) — state ≤ |groups|·nBuckets·k rows, final
  * rank 1..k per group; its gate shares
  * q_sample_stratified_weighted's SQL verbatim.
  */
object StreamingSample extends Serializable {

  /** One stream row: the item id, its positive integral weight, and
    * the event-time micros twin the fold uses. */
  case class Item(id: Long, weight: Long, tsMicros: Long)

  /** One kept entry (priority, id, weight) — ordered by
    * (priority, id), the batch kernel's sort key. */
  case class Sel(priority: Long, id: Long, weight: Long)

  /** Keyed state: the bucket's current top-k (ascending, ≤ k rows) and
    * the max seen event time (max-merged — out-of-order rows above the
    * watermark can never rewind the flush horizon). */
  case class TopKState(entries: Vector[Sel], maxTsMicros: Long)

  /** One flushed row. */
  case class BucketTop(bucket: Int, priority: Long, id: Long, weight: Long)

  private val ord: Ordering[Sel] = Ordering.by(s => (s.priority, s.id))

  /** Scala twin of [[graft.ops.Sampling.priority]]'s SQL: the i=0
    * universal hash of id, scaled by 10^6, integer-divided by the
    * weight. Exact match: h < P ≈ 1e9 ⇒ h·10^6 < 2^51; all operands
    * non-negative for id ≥ 0, and Scala `/`, Spark `div`, DuckDB `//`
    * agree on truncation there (ids are non-negative by the same
    * contract the batch query relies on). */
  def priorityOf(id: Long, weight: Long, seed: Long): Long = {
    val P = graft.functions.Portable.P
    val K = graft.functions.Portable.Knuth
    val a = (K + seed) % P
    val b = (K * 7L + seed * 31L) % P
    val h = (a * (id % P) + b) % P
    (h * Sampling.Scale) / weight
  }

  /** Shared per-key fold body for [[topK]] and [[topKByGroup]]:
    * merges the batch's (id, weight, ts) triples into the key's ≤
    * k-entry heap state, returning the FLUSHED entries — non-empty
    * only on a timer firing or the sentinel-pinned inline flush
    * (watermark already past the key's horizon). */
  private def foldBucket(in: Iterator[(Long, Long, Long)],
      state: GroupState[TopKState], k: Int, seed: Long, gapMs: Long,
      ignoreId: Long): Vector[Sel] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      st.entries
    } else {
      // max-heap of size ≤ k: head = current worst kept entry
      val heap = scala.collection.mutable.PriorityQueue.empty[Sel](ord)
      val old = state.getOption
      old.foreach(_.entries.foreach(heap.enqueue(_)))
      var maxTs = old.map(_.maxTsMicros).getOrElse(Long.MinValue)
      var saw = false
      in.foreach { case (id, weight, ts) =>
        if (id != ignoreId && weight >= 1L) {
          saw = true
          maxTs = math.max(maxTs, ts)
          val s = Sel(priorityOf(id, weight, seed), id, weight)
          if (heap.size < k) heap.enqueue(s)
          else if (ord.lt(s, heap.head)) { heap.dequeue(); heap.enqueue(s) }
        }
      }
      if (!saw && old.isEmpty) Vector.empty // sentinel-only key
      else {
        val st = TopKState(heap.dequeueAll.toVector.reverse, maxTs)
        val horizonMs = maxTs / 1000L + gapMs
        val wmMs = state.getCurrentWatermarkMs()
        if (wmMs > horizonMs) {
          // sentinel-pinned key whose timer can never fire: the
          // stream already moved past the horizon, flush inline
          state.remove()
          st.entries
        } else {
          state.update(st)
          state.setTimeoutTimestamp(math.max(horizonMs, wmMs + 1L))
          Vector.empty
        }
      }
    }
  }

  /** Pass-1 (and only) stateful operator: per-bucket bounded top-k.
    * `items` must carry a watermark on its event-time column. A bucket
    * that re-opens after its flush (late rows above the watermark)
    * emits a second partial top-k of the NEW rows only (the flush
    * removed the old state) — harmless: [[merge]] re-selects over the
    * disjoint union.
    */
  def topK(spark: SparkSession, items: Dataset[Item], k: Int, seed: Long,
      nBuckets: Int, gapSeconds: Long, ignoreId: Long): Dataset[BucketTop] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val gapMs = gapSeconds * 1000L

    def update(bucket: Int, in: Iterator[Item],
        state: GroupState[TopKState]): Iterator[BucketTop] =
      foldBucket(in.map(e => (e.id, e.weight, e.tsMicros)), state, k, seed,
          gapMs, ignoreId)
        .iterator.map(e => BucketTop(bucket, e.priority, e.id, e.weight))

    items
      .groupByKey(e => math.floorMod(e.id, nBuckets.toLong).toInt)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Final selection over the flushed per-bucket rows: global k
    * smallest by (priority, id). Driver-side on a ≤ nBuckets·k set.
    *
    * Duplicate flushed rows are a CONTRACT VIOLATION and fail loudly
    * (ADVICE r12 — was a silent `distinct` that would also shrink the
    * sample under duplicate input ids): a flush REMOVES the bucket's
    * state, so a re-opened bucket's later flush holds only rows that
    * arrived after the first flush — two identical flushed rows can
    * only mean the same (id, weight) item entered the stream twice,
    * breaking the unique-id sampling contract the batch kernel's
    * oracle relies on. */
  def merge(rows: Seq[BucketTop], k: Int): Seq[Sel] = {
    requireUnique(rows)
    rows.map(r => Sel(r.priority, r.id, r.weight)).sorted(ord).take(k)
  }

  private def requireUnique(rows: Seq[_]): Unit = {
    val dups = rows.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      "duplicate flushed sample rows (input ids not unique — the " +
        s"sampling contract): ${dups.take(3).mkString(", ")}")
  }

  /** One stream row of the stratified variant: the stratum plus the
    * [[Item]] fields. */
  case class GItem(group: String, id: Long, weight: Long, tsMicros: Long)

  /** One flushed row of the stratified variant. */
  case class GroupBucketTop(group: String, bucket: Int, priority: Long,
      id: Long, weight: Long)

  /** One final stratified selection row: rk = 1..k per group, the
    * batch kernel's row_number. */
  case class GSel(group: String, id: Long, weight: Long, priority: Long,
      rk: Int)

  /** Stratified twin of [[topK]] — the streaming face of
    * [[graft.ops.Sampling.sequentialPoissonByGroup]]: per-(group,
    * bucket) bounded top-k heaps, so one huge stratum never lands on a
    * single state key (the same salt argument as the batch kernel's
    * two-stage window). State ≤ |groups|·nBuckets·k rows TOTAL;
    * [[mergeByGroup]] re-selects per group over the ≤ nBuckets·k
    * flushed survivors of each. */
  def topKByGroup(spark: SparkSession, items: Dataset[GItem], k: Int,
      seed: Long, nBuckets: Int, gapSeconds: Long,
      ignoreId: Long): Dataset[GroupBucketTop] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val gapMs = gapSeconds * 1000L

    def update(key: (String, Int), in: Iterator[GItem],
        state: GroupState[TopKState]): Iterator[GroupBucketTop] =
      foldBucket(in.map(e => (e.id, e.weight, e.tsMicros)), state, k, seed,
          gapMs, ignoreId)
        .iterator.map(e =>
          GroupBucketTop(key._1, key._2, e.priority, e.id, e.weight))

    items
      .groupByKey(e => (e.group, math.floorMod(e.id, nBuckets.toLong).toInt))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Per-group final selection over the flushed rows: k smallest by
    * (priority, id) within each group, ranked 1..k — exactly the batch
    * kernel's `row_number() OVER (PARTITION BY group ORDER BY
    * priority, id) <= k`. Driver-side on a ≤ |groups|·nBuckets·k set;
    * same unique-row contract enforcement as [[merge]]. */
  def mergeByGroup(rows: Seq[GroupBucketTop], k: Int): Seq[GSel] = {
    requireUnique(rows)
    rows.groupBy(_.group).toSeq.sortBy(_._1).flatMap {
      case (g, rs) =>
        rs.map(r => Sel(r.priority, r.id, r.weight)).sorted(ord)
          .take(k).zipWithIndex
          .map { case (s, i) => GSel(g, s.id, s.weight, s.priority, i + 1) }
    }
  }
}
