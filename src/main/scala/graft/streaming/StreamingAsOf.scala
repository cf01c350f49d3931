package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — each purchase enriched with the
  * latest click at-or-before its event time, per key: the last join
  * flavor without a streaming twin (the inner and left-outer
  * stream-stream INTERVAL joins have gates; Spark's built-in
  * stream-stream join cannot express as-of at all, because "no lower
  * time bound" means no state eviction bound for the click side).
  *
  * The custom fold gets the bound the built-in join cannot:
  * a click older than the watermark can never be overtaken — any
  * still-unfinalized or future purchase has event time ≥ the
  * watermark, so of all such clicks only the MAXIMUM matters, and the
  * state compacts them into ONE long that persists for the key's
  * lifetime (a purchase arbitrarily far in the future is still
  * answered by it — the irreducible state of an as-of join with
  * unbounded lookback, and exactly one long per key, the same
  * key-proportional class as [[StreamingUpsert]]). Everything else in
  * the state is transient: clicks and pending purchases inside the
  * watermark horizon (ingest rate × delay, the interval-join bound
  * class), evicted at each settle — a drained key parks as the one
  * long with no timer.
  *
  * Deterministic under any batching/arrival order: a purchase is
  * finalized only once the watermark passes its event time (after
  * which a qualifying click would be late-dropped, and LateDrops
  * gates every run at zero), and its answer is the max over ALL
  * clicks ≤ its ts — so the emitted rows equal the batch ASOF LEFT
  * JOIN's rows exactly, and the parity gate shares
  * `q_asof_last_click`'s DuckDB oracle verbatim.
  *
  * Reference anchor: ops/AsOf.backward (SURVEY.md §2.5 range/as-of
  * family) — this is its no-retention streaming face.
  */
object StreamingAsOf {

  /** One stream row: key, kind ("click" / "purchase" — anything else
    * is dropped in the fold, which also absorbs sentinel routing),
    * the purchase id (ignored for clicks), event-time micros. */
  case class AItem(userId: Long, kind: String, eventId: Long,
      tsMicros: Long)

  /** `compactMax` is the max click ts strictly below the last
    * finalization watermark (Long.MinValue = none); `clicks` and
    * `pending` hold only rows at-or-above it. */
  case class AsOfState(compactMax: Long, clicks: List[Long],
      pending: List[(Long, Long)], maxTsMicros: Long)

  /** One finalized purchase; `lastClickTsMicros` is None when no
    * click precedes it (the LEFT side of the batch ASOF join). */
  case class AsOfRow(userId: Long, purchaseId: Long,
      lastClickTsMicros: Option[Long])

  /** `items` must carry a watermark on its event-time column. */
  def backward(spark: SparkSession, items: Dataset[AItem],
      gapSeconds: Long): Dataset[AsOfRow] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    // finalize every pending purchase the watermark has passed: its
    // answer is max(compactMax, max kept click <= its ts); then
    // compact clicks the watermark has passed the same way
    def settle(userId: Long, st: AsOfState, wmMicros: Long)
        : (AsOfState, List[AsOfRow]) = {
      val (done, pend) = st.pending.partition(_._2 < wmMicros)
      val out = done.sortBy(p => (p._2, p._1)).map { case (id, ts) =>
        val best = st.clicks.foldLeft(st.compactMax) { (m, c) =>
          if (c <= ts && c > m) c else m
        }
        AsOfRow(userId, id, if (best == Long.MinValue) None else Some(best))
      }
      val (old, fresh) = st.clicks.partition(_ < wmMicros)
      val cm = old.foldLeft(st.compactMax)(math.max)
      (AsOfState(cm, fresh, pend, st.maxTsMicros), out)
    }

    def update(userId: Long, in: Iterator[AItem],
        state: GroupState[AsOfState]): Iterator[AsOfRow] = {
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      // The compacted click is the key's STANDING state — a purchase
      // arbitrarily far in the future is still answered by it, so it
      // must survive settles that drain everything else (dropping it
      // forgot the key's click history; caught by the ×10 bench row's
      // fingerprint before this module ever shipped). A key parks as
      // one long with NO timer once nothing is in flight; only
      // in-horizon clicks/pending purchases re-arm the flush timer.
      def park(st: AsOfState): Unit = {
        if (st.pending.isEmpty && st.clicks.isEmpty &&
            st.compactMax == Long.MinValue) state.remove()
        else {
          state.update(st)
          if (st.pending.nonEmpty || st.clicks.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(st.maxTsMicros / 1000L + gapMs,
                state.getCurrentWatermarkMs() + 1L))
        }
      }
      if (state.hasTimedOut) {
        val (st, out) = settle(userId, state.get, wmMicros)
        park(st)
        out.iterator
      } else {
        val old = state.getOption
          .getOrElse(AsOfState(Long.MinValue, Nil, Nil, Long.MinValue))
        var clicks = old.clicks
        var pending = old.pending
        var maxTs = old.maxTsMicros
        var saw = false
        in.foreach { e =>
          e.kind match {
            case "click" =>
              clicks ::= e.tsMicros; saw = true
              maxTs = math.max(maxTs, e.tsMicros)
            case "purchase" =>
              pending ::= (e.eventId, e.tsMicros); saw = true
              maxTs = math.max(maxTs, e.tsMicros)
            case _ => () // sentinel / foreign kinds: watermark only
          }
        }
        if (!saw && old.pending.isEmpty && old.clicks.isEmpty &&
            old.compactMax == Long.MinValue)
          Iterator.empty // sentinel-only key
        else {
          val (st, out) =
            settle(userId, AsOfState(old.compactMax, clicks, pending, maxTs),
              wmMicros)
          park(st)
          out.iterator
        }
      }
    }

    items
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
