package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming batching-behavior detection — the online twin of
  * [[graft.ops.Batching]]: maximal same-activity-same-resource runs
  * with inter-event gaps ≤ `gapUs`, emitted one row per batch AS SOON
  * AS the batch is final (its successor gap exceeded `gapUs`, or the
  * key's gap timer fired).
  *
  * The run segmentation is a prefix-composable left fold per
  * (activity, resource) key: state = the OPEN batch only (id, size,
  * start, last — four longs), never the event history, because a
  * batch's membership depends only on the previous event's timestamp.
  * Same watermark-prefix argument as [[StreamingTemporal]]: the
  * below-watermark slice is immutable, each micro-batch's foldable
  * slice sits at-or-above every previously folded one, and a ts tie
  * group never straddles the strict `ts < wm` cut. Tie ORDER inside a
  * group is immaterial here — tied events have gap 0 ≤ gapUs, so the
  * whole group joins one batch whichever way it is enumerated, which
  * is why this fold (ts-sorted) and the batch oracle
  * ((ts, event_id)-sorted) agree without a tie-break contract.
  *
  * After a gap timeout flushes the open batch, the key PARKS as its
  * batch counter alone (one long, no timer) rather than deleting —
  * batch ids must stay per-key monotone when the resource later
  * resumes (the [[StreamingUpsert]] key-proportional standing-state
  * class; a deleted key would restart ids at 1). Any event arriving
  * after the timer is > gap from the flushed batch by construction
  * (its ts ≥ watermark > last + gap), so it correctly opens the next
  * batch. Per-key live state: 4 longs + the in-horizon buffer
  * (gap × rate) — independent of stream length; a hot (activity,
  * resource) pair is one key, the same bound the batch window
  * carries.
  */
object StreamingBatching extends Serializable {

  /** One stream event of the monitored (activity, resource) plane. */
  case class BItem(activity: String, resource: Long, tsMicros: Long)

  /** One CLOSED maximal run. `batchId` counts batch starts within the
    * key (1-based, matching the batch kernel's running sum). */
  case class BatchRow(activity: String, resource: Long, batchId: Long,
      batchSize: Long, tStartUs: Long, tEndUs: Long)

  /** Keyed state: `size == 0` means no open batch and `batchId` is
    * the last CLOSED batch's id (the standing counter); otherwise the
    * open batch is (batchId, size, startUs, lastUs). `tss` buffers
    * only in-horizon event times. */
  case class BSt(batchId: Long, size: Long, startUs: Long, lastUs: Long,
      tss: Seq[Long], lastMicros: Long)

  def batches(spark: SparkSession, items: Dataset[BItem], gapUs: Long,
      gapSeconds: Long): Dataset[BatchRow] = {
    import spark.implicits._
    require(gapUs >= 0L, s"gap must be >= 0 us: $gapUs")

    def key(e: BItem): (String, Long) = (e.activity, e.resource)

    // fold one sorted slice: close the open batch whenever the next
    // event's gap exceeds gapUs — the exact lag-segmentation of
    // Batching.batches, resumable from (open batch, last ts)
    def fold(k: (String, Long), st: BSt, sorted: Seq[Long],
        out: scala.collection.mutable.ListBuffer[BatchRow]): BSt = {
      var id = st.batchId; var size = st.size
      var start = st.startUs; var last = st.lastUs
      sorted.foreach { ts =>
        if (size == 0L) { id += 1L; size = 1L; start = ts; last = ts }
        else if (ts - last <= gapUs) { size += 1L; last = ts }
        else {
          out += BatchRow(k._1, k._2, id, size, start, last)
          id += 1L; size = 1L; start = ts; last = ts
        }
      }
      BSt(id, size, start, last, st.tss, st.lastMicros)
    }

    def update(k: (String, Long), in: Iterator[BItem],
        state: GroupState[BSt]): Iterator[BatchRow] = {
      val out = scala.collection.mutable.ListBuffer.empty[BatchRow]
      if (state.hasTimedOut) {
        val st0 = state.get
        // every buffered event is below the watermark now (buffered
        // ts ≤ last < last + gap < wm), so the fold is total
        val st = fold(k, st0, st0.tss.sorted, out)
        if (st.size > 0L)
          out += BatchRow(k._1, k._2, st.batchId, st.size, st.startUs, st.lastUs)
        // park as the standing batch counter, no timer
        state.update(BSt(st.batchId, 0L, 0L, 0L, Nil, st0.lastMicros))
        out.iterator
      } else {
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val old = state.getOption.getOrElse(BSt(0L, 0L, 0L, 0L, Nil, 0L))
        var last = old.lastMicros
        val fresh = scala.collection.mutable.ListBuffer.empty[Long]
        var saw = false
        in.foreach { e =>
          saw = true
          last = math.max(last, e.tsMicros)
          fresh += e.tsMicros
        }
        val buffered = old.tss ++ fresh
        val (done, rest) = buffered.partition(_ < wmMicros)
        val folded =
          if (done.isEmpty) old
          else fold(k, old, done.sorted, out)
        state.update(BSt(folded.batchId, folded.size, folded.startUs,
          folded.lastUs, rest, last))
        // only in-flight work arms the timer; a parked key stays quiet
        if (saw || rest.nonEmpty || folded.size > 0L)
          state.setTimeoutTimestamp(
            math.max(last / 1000L + gapSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1L))
        out.iterator
      }
    }

    items.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
