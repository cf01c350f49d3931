package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming concept-drift monitor: per tumbling event-time window,
  * the L1 distance between the window's activity mix and a broadcast
  * BASELINE profile (mined offline by [[graft.ops.Drift]] /
  * [[graft.ops.Dfg]]) — the live twin of the batch drift operator,
  * alerting when the stream stops looking like the corpus the models
  * were mined from.
  *
  * Same state discipline as [[TraceAssembly]]: state is keyed by
  * window start, holds alphabet-sized counts only, and is flushed by
  * an EVENT-TIME timeout when the watermark passes the window end —
  * bounded by (open windows × alphabet), independent of stream
  * length. Arithmetic matches the batch operator: exact Long
  * cross-multiplication, one final division.
  */
object StreamingDrift {

  case class InEvent(activity: String, tsMicros: Long)

  case class WindowDrift(windowStartMicros: Long, nEvents: Long,
      l1x2VsBaseline: Double)

  /** Per-window activity counts as keyed state (public for state-store
    * codegen). */
  case class Counts(m: Map[String, Long])

  /** `baseline` is the reference profile (activity → count, any
    * positive masses — it is normalized by its own total).
    */
  def monitor(spark: SparkSession, events: Dataset[InEvent],
      windowSeconds: Long,
      baseline: Map[String, Long]): Dataset[WindowDrift] = {
    import spark.implicits._
    val bBase = spark.sparkContext.broadcast(baseline)
    val winUs = windowSeconds * 1000000L

    def update(windowStart: Long, in: Iterator[InEvent],
        state: GroupState[Counts]): Iterator[WindowDrift] = {
      if (state.hasTimedOut) {
        val m = state.get.m
        state.remove()
        val base = bBase.value
        val g = base.values.sum
        val nP = m.values.sum
        // Σ_a |n_pa·G − g_a·N_p| over the union alphabet, exact Longs.
        val acts = m.keySet ++ base.keySet
        val num = acts.iterator.map { a =>
          math.abs(m.getOrElse(a, 0L) * g - base.getOrElse(a, 0L) * nP)
        }.sum
        Iterator.single(WindowDrift(windowStart, nP,
          if (nP == 0 || g == 0) 0.0 else num.toDouble / (nP.toDouble * g.toDouble)))
      } else {
        val m = scala.collection.mutable.Map.empty[String, Long] ++
          state.getOption.map(_.m).getOrElse(Map.empty)
        in.foreach(e => m(e.activity) = m.getOrElse(e.activity, 0L) + 1L)
        state.update(Counts(m.toMap))
        // flush when the watermark passes the window end
        state.setTimeoutTimestamp(windowStart / 1000L + winUs / 1000L)
        Iterator.empty
      }
    }

    events
      .groupByKey(e => (e.tsMicros / winUs) * winUs)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
