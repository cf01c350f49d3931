package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trace assembly — the natural Structured-Streaming
  * extension of the reference's incremental model (SURVEY.md §2.9):
  * the reference processes a *finished* log in one ordered pass; a
  * live source delivers events per case over time, so an open trace is
  * session state keyed by case id, closed by an event-time gap.
  *
  * `flatMapGroupsWithState` + event-time timeout = one open trace per
  * case (state is the running event buffer), flushed when the
  * watermark passes last-event + gap. Late events (behind the
  * watermark) are dropped by the grouping; *out-of-order within the
  * buffer* is tolerated and sorted at close — the batch Validator's
  * chronological check (time.rs:129-153) applies to closed traces.
  *
  * State size = events of OPEN traces only — bounded by gap × rate per
  * case, independent of stream length; this is the 100 TB-stream
  * shape: partition by case key, per-key state, no global state.
  */
object TraceAssembly extends Serializable {

  case class InEvent(caseId: String, activity: String, tsMicros: Long)

  case class ClosedTrace(
    caseId: String,
    nEvents: Long,
    startMicros: Long,
    endMicros: Long,
    activities: Seq[String])

  /** Per-case session state (public: the state-store row codegen needs
    * reflective access to the accessors). */
  case class Buf(tss: Seq[Long], acts: Seq[String], lastMicros: Long)

  /** Assembles closed traces from a (possibly unordered) event stream.
    * `events` must carry an event-time column `ts` (TimestampType)
    * with a watermark already applied; `gapSeconds` is the session
    * gap that closes a trace.
    */
  def assemble(spark: SparkSession, events: Dataset[InEvent],
      gapSeconds: Long): Dataset[ClosedTrace] = {
    import spark.implicits._

    def update(caseId: String, in: Iterator[InEvent],
        state: GroupState[Buf]): Iterator[ClosedTrace] = {
      if (state.hasTimedOut) {
        val buf = state.get
        state.remove()
        Iterator(close(caseId, buf))
      } else {
        val incoming = in.toSeq
        val old = state.getOption.getOrElse(Buf(Nil, Nil, 0L))
        val merged = Buf(old.tss ++ incoming.map(_.tsMicros),
          old.acts ++ incoming.map(_.activity),
          math.max(old.lastMicros, incoming.map(_.tsMicros).max))
        state.update(merged)
        // close when the watermark passes last event + gap
        state.setTimeoutTimestamp(merged.lastMicros / 1000L + gapSeconds * 1000L)
        Iterator.empty
      }
    }

    events.groupByKey(_.caseId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  private def close(caseId: String, buf: Buf): ClosedTrace = {
    val sorted = buf.tss.zip(buf.acts).sortBy(e => (e._1, e._2))
    ClosedTrace(caseId, sorted.size.toLong, sorted.head._1,
      sorted.last._1, sorted.map(_._2))
  }
}
