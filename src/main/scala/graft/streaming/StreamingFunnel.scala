package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel monitoring — the live counterpart of
  * [[graft.ops.Funnel.orderedStages]]: per case, which funnel stage
  * has been reached under STRICT event-order semantics (stage i needs
  * an event of stage-i type strictly after the first time stage i−1
  * was reached). Keyed state buffers a case's events until the
  * watermark closes the case ([[TraceAssembly]]'s session-state
  * shape); the stage machine runs once at close over the time-sorted
  * buffer.
  *
  * The scan is order-insensitive within timestamp ties by
  * construction: advancement requires ts strictly greater than the
  * previous stage's reach time, so an equal-timestamp event never
  * advances regardless of its position among ties — which makes the
  * closed-trace result equal to the batch operator's min-aggregate
  * semantics (t_i = min ts of stage-i events with ts > t_{i−1}).
  *
  * State per case = its open event buffer (gap-bounded); at 100 TB
  * stream scale this partitions by case key with no global state.
  */
object StreamingFunnel extends Serializable {

  case class InEvent(caseId: Long, activity: String, tsMicros: Long)

  /** reachedIdx: highest 0-based stage index reached; -1 = none. */
  case class Reached(caseId: Long, reachedIdx: Int)

  case class Buf(tss: Seq[Long], acts: Seq[String], lastMicros: Long)

  /** Pure stage machine over a (ts, activity)-sorted event list —
    * exposed for the unit spec. */
  def scan(sorted: Seq[(Long, String)], stages: Seq[String]): Int = {
    var idx = -1
    var t = Long.MinValue
    sorted.foreach { case (ts, a) =>
      if (idx + 1 < stages.size && a == stages(idx + 1) &&
          (idx == -1 || ts > t)) {
        idx += 1
        t = ts
      }
    }
    idx
  }

  /** Per-case reached stage, emitted when the watermark passes the
    * case's last event + `gapSeconds`. For whole-history funnels feed
    * a gap longer than the data span (the parity harness does). */
  def reached(spark: SparkSession, events: Dataset[InEvent],
      stages: Seq[String], gapSeconds: Long): Dataset[Reached] = {
    import spark.implicits._

    def update(caseId: Long, in: Iterator[InEvent],
        state: GroupState[Buf]): Iterator[Reached] = {
      if (state.hasTimedOut) {
        val buf = state.get
        state.remove()
        val sorted = buf.tss.zip(buf.acts).sortBy(e => (e._1, e._2))
        Iterator(Reached(caseId, scan(sorted, stages)))
      } else {
        val incoming = in.toSeq
        val old = state.getOption.getOrElse(Buf(Nil, Nil, 0L))
        val merged = Buf(old.tss ++ incoming.map(_.tsMicros),
          old.acts ++ incoming.map(_.activity),
          math.max(old.lastMicros, incoming.map(_.tsMicros).max))
        state.update(merged)
        state.setTimeoutTimestamp(merged.lastMicros / 1000L + gapSeconds * 1000L)
        Iterator.empty
      }
    }

    events.groupByKey(_.caseId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
