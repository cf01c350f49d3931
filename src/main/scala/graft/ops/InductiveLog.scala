package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full inductive miner (IM) — cut detection PLUS log splitting
  * (public algorithm family: Leemans et al.; the reference lists
  * miners as its capability direction only,
  * `/root/reference/src/lib.rs:11-22`). [[Inductive.mine]] (IMd) sees
  * only the directly-follows abstraction, so behavior the DFG cannot
  * express — a skippable sequence step, a parallel branch that some
  * traces omit — mines to a tree that rejects those traces. Full IM
  * splits the LOG at every cut and recurses on the sublogs, so
  * emptiness is observable (`xor(tau, …)` appears where traces skip a
  * block) and the mined tree fits every trace of its log by
  * construction (the perfect-fitness theorem; the events-table gate
  * asserts it via [[PetriNet.accepts]] per variant).
  *
  * Scale shape — LEVEL-SYNCHRONOUS distributed recursion, not
  * per-sublog jobs: one working DataFrame `(node, case, activity, ts,
  * tie)` holds every active sublog at the current recursion depth,
  * tagged by its tree-node path. Each level costs a fixed number of
  * distributed passes REGARDLESS of how many sublogs are active:
  *
  *  1. stats — per-(node, case) window pass (first/last/length +
  *     lag-edges), then per-node aggregation; the collect is
  *     `nodes × alphabet²`-bounded, never event-proportional;
  *  2. cut search — driver-side over each node's collected DFG
  *     (the same alphabet-sized [[Inductive.findCut]] the IMd path
  *     uses);
  *  3. split — ONE broadcast-join routing every event to its child
  *     node (`activity → child` is a total map per splitting node);
  *     only loop splits rewrite the case key (segment index from a
  *     running count of body/redo class changes — the sessionize
  *     argument). Terminal nodes drop out of the inner join.
  *
  * Depth is bounded by the alphabet (every split strictly shrinks a
  * group or strips empties exactly once), so total work is
  * O(depth) shuffles over a monotonically SHRINKING event set —
  * at 100 TB the driver never sees an event, only per-node DFGs.
  * `localCheckpoint` truncates the per-level lineage (the k-core
  * convention). Two recursion steps cost NO distributed level at all:
  * a strip-empties child shares its parent's events and stats, and an
  * xor/seq/and child whose group is a single activity is fully
  * determined by the parent's per-activity occurrence stats — both
  * fold inline on the driver, so typical logs bottom out in one or
  * two passes.
  *
  * Empty traces never materialize as rows: a child's empty-trace
  * count is `parent's trace count − observed distinct cases`, tracked
  * on the driver (seq/and children inherit the parent count; xor and
  * loop sublogs cannot lose traces / cannot produce empties).
  *
  * HYBRID RECURSION TAIL (r17 optimization): every level pays a fixed
  * number of distributed passes, so a level over a few thousand rows
  * costs the same scheduler/shuffle floor as a level over a billion —
  * and the working set only ever SHRINKS. Once the remaining events
  * fit under [[localCutoff]] (default 200k rows ≈ a few MB — the same
  * driver-boundedness class as the alphabet²-sized stats collect that
  * already runs every level), the ordered traces are collected ONCE
  * and the remaining levels run the IDENTICAL decide/split logic on
  * driver-local vectors: [[localStats]] computes the same NodeStats
  * fields and [[localSplit]] replays the broadcast-join + running
  * class-change segmentation row for row (InductiveLogSpec pins
  * tree-equality of the two paths, constructed + book logs). A log
  * that is small from the start (the textbook gates) short-circuits
  * through one limit-bounded count and never launches a level. At
  * 100 TB the top levels run distributed exactly as before — the
  * cutoff only retires the latency-bound tail, and
  * SPARK_GRAFT_IM_LOCAL_CUTOFF=0 forces the all-distributed path.
  */
object InductiveLog {

  /** Events threshold below which the remaining recursion folds on the
    * driver. Bounded driver memory by construction (rows × ~50 B).
    * Env-overridable so scale audits can pin either path. */
  def localCutoff: Long =
    sys.env.get("SPARK_GRAFT_IM_LOCAL_CUTOFF").map(_.toLong).getOrElse(200000L)

  private val ND = "_im_node"
  private val CS = "_im_case"
  private val ACT = "_im_act"
  private val TS = "_im_ts"
  private val TIE = "_im_tie"

  /** `actOcc`: activity → (max per-case occurrence count, number of
    * cases containing it) — what an xor/seq/and SINGLETON child's
    * whole decision needs, letting the driver fold those children
    * without another distributed level. */
  private case class NodeStats(
      nCases: Long, maxLen: Long,
      actOcc: Map[String, (Long, Long)],
      edges: Map[(String, String), Long],
      starts: Map[String, Long], ends: Map[String, Long]) {
    def acts: Set[String] = actOcc.keySet
  }

  def mine(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, maxLevels: Int = 64): ProcessTree =
    mineImpl(events, caseCol, activityCol, tsCol, tieBreak, 0.0, maxLevels,
      localCutoff)

  /** [[mine]] with an explicit local-fold cutoff — spec surface for
    * pinning path equality (cutoff 0 = all-distributed). */
  private[ops] def mineWithCutoff(events: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String,
      cutoff: Long, maxLevels: Int = 64): ProcessTree =
    mineImpl(events, caseCol, activityCol, tsCol, tieBreak, 0.0, maxLevels,
      cutoff)

  /** IMf with log splitting: at every node the weighted DFG is
    * thinned by [[Inductive.filterNoise]] (relative threshold `eta`
    * against the strongest edge per source) BEFORE the cut search,
    * and a sublog whose empty-trace share is within `eta` drops those
    * empties instead of emitting `xor(tau, …)` — the two places
    * infrequent behavior enters the recursion. `eta = 0` is exactly
    * [[mine]]. Noise filtering trades the perfect-fitness theorem for
    * a cleaner model (the IMf contract), so the IMf gate pins
    * closed-form trees, not acceptance. */
  def mineFiltered(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, eta: Double,
      maxLevels: Int = 64): ProcessTree = {
    require(eta >= 0.0 && eta <= 1.0, s"eta must be in [0,1], got $eta")
    mineImpl(events, caseCol, activityCol, tsCol, tieBreak, eta, maxLevels,
      localCutoff)
  }

  private def mineImpl(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, eta: Double, maxLevels: Int,
      cutoff: Long): ProcessTree = {
    import Inductive.{CutKind, Graph}
    import ProcessTree._

    val spark = events.sparkSession
    import spark.implicits._

    var df = events.select(
      lit("r").as(ND), col(caseCol).cast("string").as(CS),
      col(activityCol).cast("string").as(ACT),
      col(tsCol).as(TS), col(tieBreak).as(TIE))

    // Driver-local working set once the events fit under `cutoff`:
    // node -> case -> ordered activity vector. null while distributed.
    var local: Map[String, Map[String, Vector[String]]] = null
    // pre-gate: a log that is small from the start never launches a
    // distributed level (LocalLimit early-stops the count on big logs)
    if (cutoff > 0 && cutoff < Int.MaxValue &&
        df.limit(cutoff.toInt + 1).count() <= cutoff)
      local = collectTraces(df)

    // node path -> expected trace count (None = whatever is observed);
    // and node path -> decision: a finished subtree, or (operator tag,
    // child paths) resolved bottom-up after the loop.
    var frontier = Map[String, Option[Long]]("r" -> None)
    val decided = scala.collection.mutable
      .Map.empty[String, Either[ProcessTree, (String, Seq[String])]]

    var level = 0
    while (frontier.nonEmpty) {
      level += 1
      require(level <= maxLevels, s"IM recursion exceeded $maxLevels levels")
      // distributed level: cache the WINDOWED frame (one sort serves
      // the per-case, edge and occurrence branches AND the split join —
      // previously the lag window executed twice per level over the
      // cached raw frame); local level: pure driver folds.
      val marked: DataFrame =
        if (local == null) {
          val w = Window.partitionBy(col(ND), col(CS))
            .orderBy(col(TS), col(TIE))
          df.withColumn("_im_prev", lag(col(ACT), 1).over(w)).cache()
        } else null
      val (stats, totalEvents) =
        if (local == null) collectStats(marked) else (localStats(local), 0L)

      val instr = Seq.newBuilder[(String, String, String, Int)]
      var next = Map.empty[String, Option[Long]]

      // IMf: an empty-trace share within eta is infrequent behavior —
      // drop it rather than emitting xor(tau, …)
      def emptiesOf(expected: Long, observed: Long): Long =
        if (expected - observed <= eta * expected) 0L else expected - observed

      // An xor/seq/and child whose group is ONE activity is fully
      // determined by this node's per-activity stats — fold it on the
      // driver instead of spending a distributed level on it. (Not
      // valid for loop groups: their sublogs are re-keyed segments, so
      // per-parent-case occurrence stats do not describe them.)
      def singletonTree(a: String, expected: Long, cw: Long,
          maxOcc: Long): ProcessTree = {
        val inner = if (maxOcc <= 1L) Leaf(a) else Loop(Seq(Leaf(a), Tau))
        if (emptiesOf(expected, cw) > 0) Xor(Seq(Tau, inner)) else inner
      }

      // `path` is the logical tree node; `dataPath` is the node id the
      // EVENTS carry in the working DataFrame. They differ only below
      // a strip-empties step, which changes the tree (xor with tau)
      // without touching the events — that child folds inline against
      // the same stats rather than waiting a level.
      def decide(path: String, dataPath: String, expectedOpt: Option[Long],
          st: NodeStats): Unit = {
        val expected = expectedOpt.getOrElse(st.nCases)
        if (emptiesOf(expected, st.nCases) > 0) {
          val c = s"$path/0"
          decided(path) = Right(("xor_tau", Seq(c)))
          decide(c, dataPath, Some(st.nCases), st)
        } else if (st.acts.size == 1) {
          val a = st.acts.head
          decided(path) = Left(
            if (st.maxLen <= 1L) Leaf(a) else Loop(Seq(Leaf(a), Tau)))
        } else {
          val g =
            if (eta > 0.0)
              Inductive.filterNoise(Inductive.WeightedGraph(
                st.acts, st.edges, st.starts, st.ends), eta)
            else
              Graph(st.acts, st.edges.keySet, st.starts.keySet,
                st.ends.keySet)
          Inductive.findCut(g) match {
            case Some((kind, groups)) =>
              val tag = kind match {
                case CutKind.XorK => "xor"
                case CutKind.SeqK => "seq"
                case CutKind.AndK => "and"
                case CutKind.LoopK => "loop"
              }
              val children = groups.indices.map(i => s"$path/$i")
              decided(path) = Right((tag, children))
              groups.zipWithIndex.foreach { case (grp, i) =>
                // seq/and children keep every parent trace (some
                // possibly empty); xor routes whole traces, loop
                // sublogs are exactly the observed segments
                val childExpected: Option[Long] = kind match {
                  case CutKind.SeqK | CutKind.AndK => Some(expected)
                  case _ => None
                }
                if (grp.size == 1 && kind != CutKind.LoopK) {
                  val a = grp.head
                  val (maxOcc, cw) = st.actOcc(a)
                  decided(children(i)) = Left(
                    singletonTree(a, childExpected.getOrElse(cw), cw, maxOcc))
                } else {
                  // loop splits re-segment by class change, so the
                  // class is the group index; -1 = no segmentation
                  val cls = if (kind == CutKind.LoopK) i else -1
                  grp.foreach(a => instr += ((dataPath, a, children(i), cls)))
                  next += children(i) -> childExpected
                }
              }
            case None =>
              decided(path) = Left(
                Loop(Tau +: st.acts.toSeq.sorted.map(Leaf(_))))
          }
        }
      }

      frontier.foreach { case (path, expectedOpt) =>
        stats.get(path) match {
          case None =>
            // no events reached this sublog: every trace is empty
            decided(path) = Left(Tau)
          case Some(st) => decide(path, path, expectedOpt, st)
        }
      }

      val instrs = instr.result()
      if (next.nonEmpty) {
        if (local != null) {
          local = localSplit(local, instrs)
        } else {
          val instrDf = instrs.toDF(ND, ACT, "_im_child", "_im_cls")
          val routed = marked.drop("_im_prev")
            .join(broadcast(instrDf), Seq(ND, ACT))
          val w = Window.partitionBy(col(ND), col(CS)).orderBy(col(TS), col(TIE))
          val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val clsChanged = lag(col("_im_cls"), 1).over(w).isNull
            .or(lag(col("_im_cls"), 1).over(w) =!= col("_im_cls"))
          val out = routed
            .withColumn("_im_seg",
              sum(when(clsChanged, 1L).otherwise(0L)).over(run))
            .select(
              col("_im_child").as(ND),
              when(col("_im_cls") >= 0,
                concat(col(CS), lit("#"), col("_im_seg")))
                .otherwise(col(CS)).as(CS),
              col(ACT), col(TS), col(TIE))
          if (totalEvents <= cutoff) {
            // the split output can only be smaller than this level's
            // input — fold the remaining recursion on the driver
            local = collectTraces(out)
            marked.unpersist()
            LocalCkpt.free(df) // previous level's checkpoint, if any
          } else {
            val fresh = out.localCheckpoint(true)
            marked.unpersist()
            LocalCkpt.free(df) // previous level's checkpoint, if any
            df = fresh
          }
        }
      } else if (local == null) {
        marked.unpersist()
        LocalCkpt.free(df) // recursion ended distributed: last level's blocks
      }
      frontier = next
    }

    def build(path: String): ProcessTree = decided(path) match {
      case Left(t) => t
      case Right(("xor_tau", cs)) => Xor(Seq(Tau, build(cs.head)))
      case Right(("xor", cs)) => Xor(cs.map(build))
      case Right(("seq", cs)) => Sequence(cs.map(build))
      case Right(("and", cs)) => And(cs.map(build))
      case Right(("loop", cs)) => Loop(cs.map(build))
      case Right((tag, _)) => sys.error(s"unknown operator tag $tag")
    }
    if (decided.contains("r")) build("r") else Tau
  }

  /** One stats sweep over every active sublog: per-(node, case)
    * first/last/length plus lag-derived DFG edges, folded to one
    * alphabet²-bounded row per node. Edge/start/end FREQUENCIES ride
    * along (same pass shape) so the IMf path can threshold them.
    * Takes the CACHED windowed frame (`_im_prev` present) so the
    * per-case, edge and occurrence branches share one sort; also
    * returns the total event count (Σ per-node Σ_len) — the hybrid
    * cutoff signal. */
  private def collectStats(marked: DataFrame)
      : (Map[String, NodeStats], Long) = {
    val perCase = marked.groupBy(col(ND), col(CS)).agg(
      count(lit(1L)).as("_len"),
      min_by(col(ACT), struct(col(TS), col(TIE))).as("_first"),
      max_by(col(ACT), struct(col(TS), col(TIE))).as("_last"))
    val nodeAgg = perCase.groupBy(col(ND)).agg(
      count(lit(1L)).as("_n"),
      max(col("_len")).as("_maxLen"),
      sum(col("_len")).as("_tot"))
    def weighted(src: DataFrame, c: String, out: String) =
      src.groupBy(col(ND), col(c)).agg(count(lit(1L)).as("_wn"))
        .groupBy(col(ND))
        .agg(collect_set(struct(col(c).as("a"), col("_wn").as("n"))).as(out))
    val startW = weighted(perCase, "_first", "_starts")
    val endW = weighted(perCase, "_last", "_ends")
    val edges = marked.filter(col("_im_prev").isNotNull)
      .groupBy(col(ND), col("_im_prev"), col(ACT))
      .agg(count(lit(1L)).as("_wn"))
      .groupBy(col(ND))
      .agg(collect_set(struct(col("_im_prev").as("f"), col(ACT).as("t"),
        col("_wn").as("n"))).as("_edges"))
    val actOcc = marked.groupBy(col(ND), col(ACT), col(CS))
      .agg(count(lit(1L)).as("_o"))
      .groupBy(col(ND), col(ACT))
      .agg(max(col("_o")).as("_mo"), count(lit(1L)).as("_cw"))
      .groupBy(col(ND))
      .agg(collect_set(struct(col(ACT).as("a"), col("_mo").as("m"),
        col("_cw").as("c"))).as("_occ"))

    def wMap(r: Row, field: String): Map[String, Long] =
      Option(r.getSeq[Row](r.fieldIndex(field))).getOrElse(Seq.empty)
        .map(e => e.getString(0) -> e.getLong(1)).toMap

    val rows = nodeAgg
      .join(edges, Seq(ND), "left")
      .join(startW, Seq(ND))
      .join(endW, Seq(ND))
      .join(actOcc, Seq(ND))
      .collect()
    val stats = rows.map { r =>
        val edgeW = Option(r.getSeq[Row](r.fieldIndex("_edges")))
          .getOrElse(Seq.empty)
          .map(e => (e.getString(0), e.getString(1)) -> e.getLong(2)).toMap
        val occ = r.getSeq[Row](r.fieldIndex("_occ"))
          .map(e => e.getString(0) -> (e.getLong(1), e.getLong(2))).toMap
        r.getString(r.fieldIndex(ND)) -> NodeStats(
          r.getLong(r.fieldIndex("_n")),
          r.getLong(r.fieldIndex("_maxLen")),
          occ, edgeW, wMap(r, "_starts"), wMap(r, "_ends"))
      }.toMap
    val total =
      if (rows.isEmpty) 0L
      else { val i = rows.head.fieldIndex("_tot"); rows.map(_.getLong(i)).sum }
    (stats, total)
  }

  // ---- driver-local recursion tail (see object scaladoc) ----

  /** Collects the working frame as ordered traces: node -> case ->
    * activity vector. ONE aggregation job; ordering by (TS, TIE) is
    * done engine-side via a struct sort so the driver never touches
    * the (arbitrary-typed) ordering columns. Bounded by the cutoff
    * contract of the caller. */
  private def collectTraces(df: DataFrame)
      : Map[String, Map[String, Vector[String]]] = {
    val rows = df.groupBy(col(ND), col(CS))
      .agg(sort_array(collect_list(struct(col(TS), col(TIE), col(ACT))))
        .getField(ACT).as("_tr"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (node, rs) =>
      node -> rs.map(r =>
        r.getString(1) -> r.getSeq[String](2).toVector).toMap
    }
  }

  /** The same per-node NodeStats [[collectStats]] computes, folded
    * from local traces — field-for-field identical so decide() cannot
    * tell the paths apart. */
  private def localStats(local: Map[String, Map[String, Vector[String]]])
      : Map[String, NodeStats] =
    local.map { case (node, cases) =>
      var maxLen = 0L
      val occMax = scala.collection.mutable.Map.empty[String, Long]
      val occCw = scala.collection.mutable.Map.empty[String, Long]
      val edges = scala.collection.mutable.Map.empty[(String, String), Long]
      val starts = scala.collection.mutable.Map.empty[String, Long]
      val ends = scala.collection.mutable.Map.empty[String, Long]
      cases.values.foreach { tr =>
        if (tr.size > maxLen) maxLen = tr.size
        starts.updateWith(tr.head) { v => Some(v.getOrElse(0L) + 1L) }
        ends.updateWith(tr.last) { v => Some(v.getOrElse(0L) + 1L) }
        var i = 1
        while (i < tr.size) {
          edges.updateWith((tr(i - 1), tr(i))) { v => Some(v.getOrElse(0L) + 1L) }
          i += 1
        }
        val perTrace = tr.groupBy(identity).view.mapValues(_.size.toLong)
        perTrace.foreach { case (a, n) =>
          occCw.updateWith(a) { v => Some(v.getOrElse(0L) + 1L) }
          occMax.updateWith(a) { v => Some(math.max(v.getOrElse(0L), n)) }
        }
      }
      node -> NodeStats(cases.size.toLong, maxLen,
        occMax.keysIterator.map(a => a -> (occMax(a), occCw(a))).toMap,
        edges.toMap, starts.toMap, ends.toMap)
    }

  /** Local mirror of the distributed split: route each event by
    * (node, activity) through the instruction table, drop events with
    * no instruction (terminal children), and segment loop sublogs by
    * the running count of class changes over the ROUTED sequence —
    * `_im_seg` starts at 1 and the re-keyed case is `case#seg`,
    * byte-identical to the DataFrame path. */
  private def localSplit(local: Map[String, Map[String, Vector[String]]],
      instrs: Seq[(String, String, String, Int)])
      : Map[String, Map[String, Vector[String]]] = {
    val instrMap: Map[(String, String), (String, Int)] =
      instrs.map { case (nd, a, child, cls) => (nd, a) -> (child, cls) }.toMap
    val out = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, Vector[String]]]
    local.foreach { case (node, cases) =>
      cases.foreach { case (cs, tr) =>
        var seg = 0L
        var prevCls = Int.MinValue
        var first = true
        tr.foreach { a =>
          instrMap.get((node, a)).foreach { case (child, cls) =>
            if (first || cls != prevCls) seg += 1L
            first = false
            prevCls = cls
            val key = if (cls >= 0) s"$cs#$seg" else cs
            val m = out.getOrElseUpdate(child,
              scala.collection.mutable.Map.empty[String, Vector[String]])
            m.update(key, m.getOrElse(key, Vector.empty) :+ a)
          }
        }
      }
    }
    out.view.mapValues(_.toMap).toMap
  }
}
