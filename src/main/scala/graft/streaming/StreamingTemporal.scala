package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transition pairs — the online temporal-conformance
  * primitive: every directly-follows occurrence `(actFrom, actTo,
  * waitUs)` is emitted AS SOON AS it is final (both events below the
  * watermark), not at case close. Deviation alerting is a stateless
  * broadcast-joined filter downstream ([[graft.ops.Temporal
  * .deviationFlags]] against a fixed profile), so a conformance
  * monitor raises the alarm while the offending case is still
  * running — the whole point of ONLINE conformance, and the property
  * a close-time emitter (the [[StreamingDfg]] contract) cannot give.
  *
  * State is the DFG fold MINUS the edge-count map: the watermark
  * finalizes a sorted prefix (the [[StreamingFunnel]]/[[StreamingDfg]]
  * compaction argument — every event below it is immutable, each
  * micro-batch's foldable slice sits at-or-above every previously
  * folded one, and a (ts, activity) tie group never straddles the
  * strict ts < wm cut), and consecutive-pair emission is a
  * prefix-composable left fold with state = ONE (ts, activity) pair.
  * Per-case state: that pair + the in-horizon buffer. Pairs are
  * emitted exactly once: each is produced at the unique fold step
  * that consumes its right event.
  */
object StreamingTemporal extends Serializable {

  case class Pair(caseId: String, actFrom: String, actTo: String, waitUs: Long)

  /** `lastAct`/`lastTs` is the final event of the folded
    * (below-watermark) prefix; `tss`/`acts` buffer only in-horizon
    * events. */
  case class TpSt(hasLast: Boolean, lastTs: Long, lastAct: String,
      tss: Seq[Long], acts: Seq[String], lastMicros: Long)

  /** Fold a (ts, activity)-sorted slice, appending one emitted [[Pair]]
    * per step that has a predecessor. Prefix-composable. */
  private def advance(caseId: String, st: TpSt, sorted: Seq[(Long, String)],
      out: scala.collection.mutable.ListBuffer[Pair]): TpSt = {
    if (sorted.isEmpty) return st
    var hasLast = st.hasLast
    var lastAct = st.lastAct
    var lastTs = st.lastTs
    sorted.foreach { case (ts, a) =>
      if (hasLast) out += Pair(caseId, lastAct, a, ts - lastTs)
      hasLast = true; lastAct = a; lastTs = ts
    }
    TpSt(hasLast, lastTs, lastAct, st.tss, st.acts, st.lastMicros)
  }

  def pairs(spark: SparkSession, events: Dataset[TraceAssembly.InEvent],
      gapSeconds: Long): Dataset[Pair] = {
    import spark.implicits._

    def update(caseId: String, in: Iterator[TraceAssembly.InEvent],
        state: GroupState[TpSt]): Iterator[Pair] = {
      val out = scala.collection.mutable.ListBuffer.empty[Pair]
      if (state.hasTimedOut) {
        val st0 = state.get
        state.remove()
        val sorted = st0.tss.zip(st0.acts).sortBy(e => (e._1, e._2))
        advance(caseId, st0, sorted, out)
        out.iterator
      } else {
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val old = state.getOption
          .getOrElse(TpSt(hasLast = false, 0L, "", Nil, Nil, 0L))
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
          else advance(caseId, old, done.sortBy(e => (e._1, e._2)), out)
        state.update(TpSt(folded.hasLast, folded.lastTs, folded.lastAct,
          rest.map(_._1), rest.map(_._2), last))
        state.setTimeoutTimestamp(last / 1000L + gapSeconds * 1000L)
        out.iterator
      }
    }

    events.groupByKey(_.caseId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
