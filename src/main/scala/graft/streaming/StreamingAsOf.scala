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
  * state compacts them into ONE (ts, payload) pair that persists for
  * the key's lifetime (a purchase arbitrarily far in the future is
  * still answered by it — the irreducible state of an as-of join with
  * unbounded lookback, and exactly one pair per key, the same
  * key-proportional class as [[StreamingUpsert]]). Everything else in
  * the state is transient: clicks and pending purchases inside the
  * watermark horizon (ingest rate × delay, the interval-join bound
  * class), evicted at each settle — a drained key parks as the one
  * pair with no timer.
  *
  * Payload: each emitted row carries the matched click's payload (its
  * event id) alongside the matched timestamp — the enrichment face of
  * the operator. Click candidates compare as (ts, payload) structs,
  * mirroring [[graft.ops.AsOf]]'s struct-ordered tie policy exactly
  * (backward: greatest; forward: least among strictly-later, greatest
  * at exactly the purchase ts — the batch equal-ts recovery path), so
  * the twins stay bit-equal even on inputs with (key, ts) ties.
  *
  * Deterministic under any batching/arrival order: a purchase is
  * finalized only once the watermark passes its event time (after
  * which a qualifying click would be late-dropped, and LateDrops
  * gates every run at zero), and its answer is the struct-max over ALL
  * clicks ≤ its ts — so the emitted rows equal the batch ASOF LEFT
  * JOIN's rows exactly, and the parity gate shares
  * `q_asof_last_click`'s DuckDB oracle verbatim.
  *
  * State encoding changed when payloads landed (clicks are (ts, pay)
  * pairs now); checkpoints are ephemeral bench/test dirs throughout
  * the repo, so no state-format migration is provided — restoring a
  * pre-payload checkpoint is not supported.
  *
  * Reference anchor: ops/AsOf.backward (SURVEY.md §2.5 range/as-of
  * family) — this is its no-retention streaming face.
  */
object StreamingAsOf extends Serializable {

  /** One stream row: key, kind ("click" / "purchase" — anything else
    * is dropped in the fold, which also absorbs sentinel routing),
    * the event id (the purchase id for purchases; the click's payload
    * identity for clicks), event-time micros. */
  case class AItem(userId: Long, kind: String, eventId: Long,
      tsMicros: Long)

  /** A click candidate: event-time micros + payload (its event id).
    * Orders lexicographically — the batch kernel's struct order. */
  case class Click(ts: Long, pay: Long)

  private val NoClick = Click(Long.MinValue, Long.MinValue)

  private def structMax(a: Click, b: Click): Click =
    if (b.ts > a.ts || (b.ts == a.ts && b.pay > a.pay)) b else a

  /** `compact` is the struct-max click strictly below the last
    * finalization watermark ([[NoClick]] = none); `clicks` and
    * `pending` hold only rows at-or-above it. */
  case class AsOfState(compactTs: Long, compactPay: Long,
      clicks: List[Click], pending: List[(Long, Long)], maxTsMicros: Long)

  /** One finalized purchase; the matched-click fields are None when no
    * click precedes it (the LEFT side of the batch ASOF join). */
  case class AsOfRow(userId: Long, purchaseId: Long,
      lastClickTsMicros: Option[Long], lastClickId: Option[Long])

  /** `items` must carry a watermark on its event-time column. */
  def backward(spark: SparkSession, items: Dataset[AItem],
      gapSeconds: Long): Dataset[AsOfRow] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    // finalize every pending purchase the watermark has passed: its
    // answer is structMax(compact, max kept click <= its ts); then
    // compact clicks the watermark has passed the same way
    def settle(userId: Long, st: AsOfState, wmMicros: Long)
        : (AsOfState, List[AsOfRow]) = {
      val compact = Click(st.compactTs, st.compactPay)
      val (done, pend) = st.pending.partition(_._2 < wmMicros)
      val out = done.sortBy(p => (p._2, p._1)).map { case (id, ts) =>
        val best = st.clicks.foldLeft(compact) { (m, c) =>
          if (c.ts <= ts) structMax(m, c) else m
        }
        AsOfRow(userId, id,
          if (best == NoClick) None else Some(best.ts),
          if (best == NoClick) None else Some(best.pay))
      }
      val (old, fresh) = st.clicks.partition(_.ts < wmMicros)
      val cm = old.foldLeft(compact)(structMax)
      (AsOfState(cm.ts, cm.pay, fresh, pend, st.maxTsMicros), out)
    }

    def update(userId: Long, in: Iterator[AItem],
        state: GroupState[AsOfState]): Iterator[AsOfRow] = {
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      // The compacted click is the key's STANDING state — a purchase
      // arbitrarily far in the future is still answered by it, so it
      // must survive settles that drain everything else (dropping it
      // forgot the key's click history; caught by the ×10 bench row's
      // fingerprint before this module ever shipped). A key parks as
      // one pair with NO timer once nothing is in flight; only
      // in-horizon clicks/pending purchases re-arm the flush timer.
      def park(st: AsOfState): Unit = {
        if (st.pending.isEmpty && st.clicks.isEmpty &&
            st.compactTs == Long.MinValue) state.remove()
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
          .getOrElse(AsOfState(Long.MinValue, Long.MinValue, Nil, Nil,
            Long.MinValue))
        var clicks = old.clicks
        var pending = old.pending
        var maxTs = old.maxTsMicros
        var saw = false
        in.foreach { e =>
          e.kind match {
            case "click" =>
              clicks ::= Click(e.tsMicros, e.eventId); saw = true
              maxTs = math.max(maxTs, e.tsMicros)
            case "purchase" =>
              pending ::= (e.eventId, e.tsMicros); saw = true
              maxTs = math.max(maxTs, e.tsMicros)
            case _ => () // sentinel / foreign kinds: watermark only
          }
        }
        if (!saw && old.pending.isEmpty && old.clicks.isEmpty &&
            old.compactTs == Long.MinValue)
          Iterator.empty // sentinel-only key
        else {
          val (st, out) =
            settle(userId, AsOfState(old.compactTs, old.compactPay, clicks,
              pending, maxTs), wmMicros)
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

  /** One finalized purchase of the FORWARD flavor; None when no click
    * lands in [ts, ts + horizon]. */
  case class FwdRow(userId: Long, purchaseId: Long,
      firstClickTsMicros: Option[Long], firstClickId: Option[Long])

  /** Pending purchase: id, ts, best forward candidate so far
    * (fwdTs = Long.MaxValue = none), frozen backward answer
    * (bwdTs = Long.MinValue = none; only [[nearest]] reads it, and
    * only once `bwdFinal`). */
  case class PendPurchase(id: Long, ts: Long, fwdTs: Long, fwdPay: Long,
      bwdTs: Long, bwdPay: Long, bwdFinal: Boolean)

  case class FwdState(compactTs: Long, compactPay: Long,
      clicks: List[Click], pending: List[PendPurchase], maxTsMicros: Long)

  /** One finalized purchase of the NEAREST flavor. */
  case class NearRow(userId: Long, purchaseId: Long,
      nearestClickTsMicros: Option[Long], nearestClickId: Option[Long])

  /** Is click `c` a better FORWARD candidate than (curTs, curPay) for
    * a purchase at `pTs`? Mirrors the batch tie policy: least ts
    * first; at equal candidate ts, least payload — except candidates
    * at exactly the purchase ts, where the batch equal-ts recovery
    * path takes the backward (greatest-payload) struct. */
  private def fwdBetter(c: Click, curTs: Long, curPay: Long,
      pTs: Long): Boolean =
    c.ts < curTs || (c.ts == curTs &&
      (if (c.ts == pTs) c.pay > curPay else c.pay < curPay))

  /** Streaming FORWARD as-of — each purchase enriched with the FIRST
    * click in [ts, ts + horizon], per key. The horizon is the
    * operator's contract, not a tuning knob: backward's unbounded
    * lookback streams because the PAST compacts to one pair, but "no
    * following click" is never final while the stream lives — the
    * forward flavor that exists on an unbounded stream is "first
    * click within H". A purchase finalizes when the watermark passes
    * ts + horizon (every qualifying click has event time ≤ ts +
    * horizon < watermark, so it has arrived or was late-dropped, and
    * LateDrops gates every run at zero) — so the emitted rows equal
    * the horizon-bounded batch [[graft.ops.AsOf.forward]] exactly and
    * the parity gate shares its DuckDB oracle verbatim.
    *
    * State is FULLY transient (the mirror-image of backward's one
    * standing pair): pending purchases live horizon + delay; a click
    * below the watermark can never match a future purchase (the
    * purchase would have ts ≥ watermark > click, and forward needs
    * click ≥ ts), so clicks are folded into every pending purchase's
    * running best ON ARRIVAL and evicted at each settle — a drained
    * key's state is REMOVED entirely. */
  def forward(spark: SparkSession, items: Dataset[AItem],
      horizonSeconds: Long, gapSeconds: Long): Dataset[FwdRow] = {
    import spark.implicits._
    val horizonUs = horizonSeconds * 1000000L
    fold[FwdRow](items, horizonUs, gapSeconds * 1000L,
      needBwd = false) { (userId, p) =>
      FwdRow(userId, p.id,
        if (p.fwdTs == Long.MaxValue) None else Some(p.fwdTs),
        if (p.fwdTs == Long.MaxValue) None else Some(p.fwdPay))
    }
  }

  /** Streaming NEAREST as-of — each purchase enriched with whichever
    * of (last click ≤ ts, unbounded lookback) and (first click in
    * [ts, ts + horizon]) lies closer; equal distance resolves
    * BACKWARD, matching [[graft.ops.AsOf.nearest]] whose oracle the
    * parity gate shares verbatim.
    *
    * State composes the two sides' irreducible parts: the backward
    * standing pair (compacted struct-max click below the watermark —
    * one pair per key, for life) plus forward's transient horizon. The
    * subtlety the composition adds: a purchase now OUTLIVES the
    * watermark passing its ts (it waits on ts + horizon), so its
    * backward answer is FROZEN at the first settle where watermark >
    * ts — after that, clicks in (ts, watermark) may compact into the
    * standing pair without polluting the already-frozen answer
    * (backward alone never needed the freeze: it finalizes the
    * purchase at that same boundary). */
  def nearest(spark: SparkSession, items: Dataset[AItem],
      horizonSeconds: Long, gapSeconds: Long): Dataset[NearRow] = {
    import spark.implicits._
    val horizonUs = horizonSeconds * 1000000L
    fold[NearRow](items, horizonUs, gapSeconds * 1000L,
      needBwd = true) { (userId, p) =>
      val b = if (p.bwdTs == Long.MinValue) None else Some(Click(p.bwdTs, p.bwdPay))
      val f = if (p.fwdTs == Long.MaxValue) None else Some(Click(p.fwdTs, p.fwdPay))
      val near = (b, f) match {
        case (None, x) => x
        case (x, None) => x
        case (Some(bv), Some(fv)) =>
          if (p.ts - bv.ts <= fv.ts - p.ts) Some(bv) else Some(fv)
      }
      NearRow(userId, p.id, near.map(_.ts), near.map(_.pay))
    }
  }

  /** The shared horizon-bounded fold behind [[forward]] and
    * [[nearest]]. `emit` renders a finalized purchase (its `bwd` is
    * frozen-final iff `needBwd`). */
  private def fold[R: org.apache.spark.sql.Encoder](items: Dataset[AItem],
      horizonUs: Long, gapMs: Long, needBwd: Boolean)(
      emit: (Long, PendPurchase) => R): Dataset[R] = {
    val spark = items.sparkSession
    import spark.implicits._

    // 1) freeze backward answers for purchases the watermark passed
    //    (before compaction — the kept click list still holds every
    //    click in (last settle wm, now] and compact every older);
    // 2) finalize purchases with wm > ts + horizon (their fwd best is
    //    complete: any further qualifying click would be late);
    // 3) compact clicks below the watermark into the standing pair
    //    (dropped entirely when !needBwd — forward never reads it).
    def settle(userId: Long, st: FwdState, wmMicros: Long)
        : (FwdState, List[R]) = {
      val compact = Click(st.compactTs, st.compactPay)
      val frozen = st.pending.map { p =>
        if (needBwd && !p.bwdFinal && p.ts < wmMicros) {
          val b = st.clicks.foldLeft(compact) { (m, c) =>
            if (c.ts <= p.ts) structMax(m, c) else m
          }
          p.copy(bwdTs = b.ts, bwdPay = b.pay, bwdFinal = true)
        } else p
      }
      val (done, pend) = frozen.partition(p =>
        wmMicros > safeAdd(p.ts, horizonUs))
      val out = done.sortBy(p => (p.ts, p.id)).map(emit(userId, _))
      val (old, fresh) = st.clicks.partition(_.ts < wmMicros)
      val cm = if (needBwd) old.foldLeft(compact)(structMax) else NoClick
      (FwdState(cm.ts, cm.pay, fresh, pend, st.maxTsMicros), out)
    }

    def update(userId: Long, in: Iterator[AItem],
        state: GroupState[FwdState]): Iterator[R] = {
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      def park(st: FwdState): Unit = {
        if (st.pending.isEmpty && st.clicks.isEmpty &&
            st.compactTs == Long.MinValue) state.remove()
        else {
          state.update(st)
          if (st.pending.nonEmpty || st.clicks.nonEmpty) {
            // wake at the earliest finalization boundary; click-only
            // state uses the gap fallback so a drained key still
            // empties (forward) or compacts to the pair (nearest)
            val next =
              if (st.pending.nonEmpty)
                st.pending.map(p => safeAdd(p.ts, horizonUs)).min / 1000L + 1L
              else st.maxTsMicros / 1000L + gapMs
            state.setTimeoutTimestamp(
              math.max(next, state.getCurrentWatermarkMs() + 1L))
          }
        }
      }
      if (state.hasTimedOut) {
        val (st, out) = settle(userId, state.get, wmMicros)
        park(st)
        out.iterator
      } else {
        val old = state.getOption
          .getOrElse(FwdState(Long.MinValue, Long.MinValue, Nil, Nil,
            Long.MinValue))
        var clicks = old.clicks
        var pending = old.pending
        var maxTs = old.maxTsMicros
        var saw = false
        in.foreach { e =>
          e.kind match {
            case "click" =>
              val c = Click(e.tsMicros, e.eventId)
              // fold into every pending purchase's window on arrival —
              // the click may be evicted before the purchase finalizes
              pending = pending.map { p =>
                if (c.ts >= p.ts && c.ts <= safeAdd(p.ts, horizonUs) &&
                  fwdBetter(c, p.fwdTs, p.fwdPay, p.ts))
                  p.copy(fwdTs = c.ts, fwdPay = c.pay)
                else p
              }
              clicks ::= c; saw = true
              maxTs = math.max(maxTs, c.ts)
            case "purchase" =>
              // kept clicks ≥ last settle's watermark ≤ this ts cover
              // the whole [ts, ts+H] candidate set (older clicks are
              // < wm ≤ ts, below the forward window)
              var bestTs = Long.MaxValue; var bestPay = Long.MaxValue
              clicks.foreach { c =>
                if (c.ts >= e.tsMicros && c.ts <= safeAdd(e.tsMicros, horizonUs) &&
                  fwdBetter(c, bestTs, bestPay, e.tsMicros)) {
                  bestTs = c.ts; bestPay = c.pay
                }
              }
              pending ::= PendPurchase(e.eventId, e.tsMicros, bestTs, bestPay,
                Long.MinValue, Long.MinValue, bwdFinal = false)
              saw = true
              maxTs = math.max(maxTs, e.tsMicros)
            case _ => () // sentinel / foreign kinds: watermark only
          }
        }
        if (!saw && old.pending.isEmpty && old.clicks.isEmpty &&
            old.compactTs == Long.MinValue)
          Iterator.empty // sentinel-only key
        else {
          val (st, out) =
            settle(userId, FwdState(old.compactTs, old.compactPay, clicks,
              pending, maxTs), wmMicros)
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

  /** ts + horizon without Long overflow (a far-future sentinel ts plus
    * a large horizon must saturate, not wrap). */
  private def safeAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0L) Long.MaxValue else s
  }
}
