package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming directly-follows mining — exact under out-of-order
  * arrival within the watermark, unlike last-event-state streaming
  * DFGs that corrupt edges on any reordering.
  *
  * r15: the per-case state no longer buffers the whole open trace.
  * The DFG edge multiset of a time-sorted trace is a LEFT FOLD with
  * state (last event, edge counts) — consecutive-pair counting — and
  * the watermark finalizes a sorted prefix exactly as in
  * [[StreamingFunnel]] (every event below it is immutable; each
  * micro-batch's foldable slice sits at-or-above every previously
  * folded one; a (ts, activity) tie group never straddles the strict
  * ts < wm cut). So the keyed state compacts the below-watermark
  * history into ONE (ts, activity) pair plus an edge-count map bounded
  * by |alphabet|² — NOT by trace length — and buffers only in-horizon
  * events. The old shape ([[TraceAssembly]]'s full event buffer)
  * re-serialized each case's growing history at every touching
  * micro-batch; at ×100 that was the most expensive row of the
  * file-source audit (SCALE.md r15).
  *
  * Emission contract unchanged: one [[Edge]] row per directly-follows
  * OCCURRENCE of the closed trace (counts expand at flush), so
  * downstream aggregations see the identical multiset.
  *
  * State-format note: the compaction changed the state encoding (the
  * edge map became parallel seqs), which a checkpoint written by the
  * pre-compaction encoding cannot deserialize. Checkpoints are
  * ephemeral bench/test dirs throughout this repo, so no migration is
  * provided — a long-lived deployment upgrading across the change
  * must restart the query from a fresh checkpoint location (the
  * standard Structured Streaming state-schema-evolution posture).
  */
object StreamingDfg extends Serializable {

  case class Edge(actFrom: String, actTo: String)

  /** Compacted fold state: `lastAct`/`lastTs` is the final event of
    * the folded (below-watermark) prefix (`hasLast` false until the
    * first fold); `edgeFrom`/`edgeTo`/`edgeN` are parallel columns of
    * the edge-count map — STRUCTURED, because activity names may
    * contain any character (the r15 shape joined the pair on a
    * control-byte separator and split on its first occurrence, which
    * a separator-bearing activity would corrupt); `tss`/`acts` buffer
    * only in-horizon events. */
  case class DfgSt(hasLast: Boolean, lastTs: Long, lastAct: String,
      edgeFrom: Seq[String], edgeTo: Seq[String], edgeN: Seq[Long],
      tss: Seq[Long], acts: Seq[String], lastMicros: Long)

  /** Advance the (last event, edge counts) fold through a
    * (ts, activity)-sorted slice. Prefix-composable: folding a sorted
    * trace in consecutive slices yields the same counts as folding it
    * whole. The hash map is materialized from / back to the
    * parallel-seq state columns once per touching micro-batch —
    * O(|alphabet|²), the same order as serializing the state at all. */
  private def advance(st: DfgSt, sorted: Seq[(Long, String)]): DfgSt = {
    if (sorted.isEmpty) return st
    val edges = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var i = 0
    while (i < st.edgeFrom.length) {
      edges.put((st.edgeFrom(i), st.edgeTo(i)), st.edgeN(i)); i += 1
    }
    var hasLast = st.hasLast
    var lastAct = st.lastAct
    var lastTs = st.lastTs
    sorted.foreach { case (ts, a) =>
      if (hasLast) {
        val k = (lastAct, a)
        edges.put(k, edges.getOrElse(k, 0L) + 1L)
      }
      hasLast = true; lastAct = a; lastTs = ts
    }
    val ks = edges.keysIterator.toArray
    DfgSt(hasLast, lastTs, lastAct,
      ks.map(_._1).toSeq, ks.map(_._2).toSeq, ks.map(edges(_)).toSeq,
      st.tss, st.acts, st.lastMicros)
  }

  /** Long-safe `Iterator.fill`: `Iterator.fill(n.toInt)` on a count
    * above Int.MaxValue wraps negative and yields an EMPTY iterator —
    * silently dropping occurrences. This form never truncates. */
  private def fillL(n: Long, e: Edge): Iterator[Edge] =
    new Iterator[Edge] {
      private var i = 0L
      def hasNext: Boolean = i < n
      def next(): Edge = { i += 1L; e }
    }

  def edges(spark: SparkSession, events: Dataset[TraceAssembly.InEvent],
      gapSeconds: Long): Dataset[Edge] = {
    import spark.implicits._

    def update(caseId: String, in: Iterator[TraceAssembly.InEvent],
        state: GroupState[DfgSt]): Iterator[Edge] = {
      if (state.hasTimedOut) {
        val st0 = state.get
        state.remove()
        val sorted = st0.tss.zip(st0.acts).sortBy(e => (e._1, e._2))
        val st = advance(st0, sorted)
        st.edgeFrom.indices.iterator.flatMap { i =>
          fillL(st.edgeN(i), Edge(st.edgeFrom(i), st.edgeTo(i)))
        }
      } else {
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val old = state.getOption
          .getOrElse(DfgSt(hasLast = false, 0L, "", Nil, Nil, Nil, Nil, Nil, 0L))
        var last = old.lastMicros
        val fresh = scala.collection.mutable.ListBuffer.empty[(Long, String)]
        in.foreach { e =>
          last = math.max(last, e.tsMicros)
          fresh += ((e.tsMicros, e.activity))
        }
        val pairs = old.tss.zip(old.acts) ++ fresh
        val (done, rest) = pairs.partition(_._1 < wmMicros)
        val folded =
          if (done.isEmpty) old
          else advance(old, done.sortBy(e => (e._1, e._2)))
        state.update(DfgSt(folded.hasLast, folded.lastTs, folded.lastAct,
          folded.edgeFrom, folded.edgeTo, folded.edgeN,
          rest.map(_._1), rest.map(_._2), last))
        state.setTimeoutTimestamp(last / 1000L + gapSeconds * 1000L)
        Iterator.empty
      }
    }

    events.groupByKey(_.caseId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
