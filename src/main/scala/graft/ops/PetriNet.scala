package graft.ops

/** Labeled place/transition net with silent (τ) transitions, an
  * initial and a final marking — the execution model that process
  * trees and [[Alpha.WorkflowNet]]s compile into, and the unit PNML
  * serializes ([[Pnml]]). Arc weights are 1 (workflow nets).
  */
case class PetriNet(
    places: Seq[String],
    transitions: Seq[PetriNet.Transition],
    arcs: Seq[(String, String)],
    initialMarking: Map[String, Int],
    finalMarking: Map[String, Int]) {

  /** inputs/outputs per transition id, precomputed. */
  private[ops] lazy val inputsOf: Map[String, Seq[String]] = {
    val t = transitions.map(_.id).toSet
    arcs.filter(a => t(a._2)).groupBy(_._2).view.mapValues(_.map(_._1)).toMap
  }
  private[ops] lazy val outputsOf: Map[String, Seq[String]] = {
    val t = transitions.map(_.id).toSet
    arcs.filter(a => t(a._1)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private[ops] def enabled(m: Map[String, Int], t: String): Boolean =
    inputsOf.getOrElse(t, Nil).forall(p => m.getOrElse(p, 0) > 0)

  private[ops] def fire(m: Map[String, Int], t: String): Map[String, Int] = {
    val afterIn = inputsOf.getOrElse(t, Nil).foldLeft(m)((mm, p) =>
      mm.updated(p, mm(p) - 1))
    outputsOf.getOrElse(t, Nil).foldLeft(afterIn)((mm, p) =>
      mm.updated(p, mm.getOrElse(p, 0) + 1))
  }

  /** True iff some firing sequence consumes exactly `trace` (labeled
    * transitions in order, any number of τ firings interleaved) from
    * the initial marking to the final marking.
    *
    * Position-synchronous frontier simulation (the Thompson-NFA
    * scheme): the frontier is the set of markings reachable after
    * consuming a prefix; each step τ-closes the frontier, then fires
    * every enabled transition labeled with the next event. Markings
    * are int arrays over indexed places — the per-variant acceptance
    * behind `q_inductive_log_fitness` runs this over thousands of
    * variants per executor, where the earlier (marking, position) BFS
    * over persistent Maps was ~40× slower on τ-rich and/loop nets.
    * `maxStates` caps cumulative distinct markings across positions
    * and guards degenerate inputs.
    */
  def accepts(trace: Seq[String], maxStates: Int = 200000): Boolean = {
    import scala.collection.immutable.ArraySeq
    import scala.collection.mutable
    val pIdx = places.zipWithIndex.toMap
    val nP = places.size
    val tIn = transitions.map(t =>
      inputsOf.getOrElse(t.id, Nil).map(pIdx).toArray).toArray
    val tOut = transitions.map(t =>
      outputsOf.getOrElse(t.id, Nil).map(pIdx).toArray).toArray
    val tauIdx = transitions.indices.filter(transitions(_).label.isEmpty).toArray
    val byLabel: Map[String, Array[Int]] = transitions.zipWithIndex
      .collect { case (t, i) if t.label.isDefined => (t.label.get, i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap

    // Fast path (r17): pack the whole marking into ONE Long when the
    // place count allows ≥ 2 bits per place. Process-tree/workflow
    // nets are small and (near-)safe, so token counts fit the field;
    // a field about to overflow aborts to the generic array path
    // (same frontier sets, same budget accounting, same result —
    // PetriNetSpec pins equality). Removes the per-marking Array
    // clone + ArraySeq boxing + hash of the hot loop: the per-variant
    // acceptance behind q_inductive_log_fitness was ~10× slower on
    // τ-rich and/loop nets without it.
    if (nP > 0 && nP <= 32) {
      try return acceptsPacked(trace, maxStates, nP, tIn, tOut, tauIdx,
        byLabel, pIdx)
      catch { case PetriNet.PackedOverflow => /* fall through */ }
    }

    def enabledAt(m: Array[Int], t: Int): Boolean = {
      val in = tIn(t); var i = 0
      while (i < in.length) { if (m(in(i)) <= 0) return false; i += 1 }
      true
    }
    def fireAt(m: Array[Int], t: Int): Array[Int] = {
      val n = m.clone()
      tIn(t).foreach(p => n(p) -= 1)
      tOut(t).foreach(p => n(p) += 1)
      n
    }

    var total = 0
    def budget(): Unit = {
      total += 1
      if (total > maxStates)
        throw new IllegalStateException(s"state space exceeds $maxStates")
    }
    // expand the frontier in place with every τ-reachable marking
    def tauClose(frontier: mutable.ArrayBuffer[Array[Int]],
        seen: mutable.HashSet[ArraySeq[Int]]): Unit = {
      var i = 0
      while (i < frontier.length) {
        val m = frontier(i)
        var ti = 0
        while (ti < tauIdx.length) {
          val t = tauIdx(ti)
          if (enabledAt(m, t)) {
            val n = fireAt(m, t)
            if (seen.add(ArraySeq.unsafeWrapArray(n))) { budget(); frontier += n }
          }
          ti += 1
        }
        i += 1
      }
    }

    val init = new Array[Int](nP)
    initialMarking.foreach { case (p, c) => init(pIdx(p)) = c }
    var frontier = mutable.ArrayBuffer(init)
    var seen = mutable.HashSet(ArraySeq.unsafeWrapArray(init))
    tauClose(frontier, seen)

    val it = trace.iterator
    while (it.hasNext) {
      val a = it.next()
      val ts = byLabel.getOrElse(a, Array.empty[Int])
      val next = mutable.ArrayBuffer.empty[Array[Int]]
      val nextSeen = mutable.HashSet.empty[ArraySeq[Int]]
      frontier.foreach { m =>
        ts.foreach { t =>
          if (enabledAt(m, t)) {
            val n = fireAt(m, t)
            if (nextSeen.add(ArraySeq.unsafeWrapArray(n))) { budget(); next += n }
          }
        }
      }
      if (next.isEmpty) return false
      frontier = next
      seen = nextSeen
      tauClose(frontier, seen)
    }

    val target = new Array[Int](nP)
    finalMarking.foreach { case (p, c) => target(pIdx(p)) = c }
    frontier.exists(m => java.util.Arrays.equals(m, target))
  }

  /** [[accepts]] over Long-packed markings — 64/nP bits per place,
    * open-addressed primitive seen-sets, zero allocation per firing.
    * Throws [[PetriNet.PackedOverflow]] when a token count would no
    * longer fit its field; the caller falls back to the array path.
    * Semantics (frontier sets, cumulative `maxStates` budget, result)
    * are identical by construction. */
  private def acceptsPacked(trace: Seq[String], maxStates: Int, nP: Int,
      tIn: Array[Array[Int]], tOut: Array[Array[Int]], tauIdx: Array[Int],
      byLabel: Map[String, Array[Int]], pIdx: Map[String, Int]): Boolean = {
    val bits = 64 / nP
    val mask = if (bits >= 64) -1L else (1L << bits) - 1L
    // transition deltas precomputed as (requiredMask-check inputs,
    // packed subtract, packed add); overflow detected per firing
    val nT = tIn.length
    val inShift = Array.tabulate(nT)(t => tIn(t).map(_ * bits))
    val outShift = Array.tabulate(nT)(t => tOut(t).map(_ * bits))

    @inline def enabledP(m: Long, t: Int): Boolean = {
      val s = inShift(t); var i = 0
      while (i < s.length) { if (((m >>> s(i)) & mask) == 0L) return false; i += 1 }
      true
    }
    @inline def fireP(m: Long, t: Int): Long = {
      var n = m
      val si = inShift(t); var i = 0
      while (i < si.length) { n -= (1L << si(i)); i += 1 }
      val so = outShift(t); i = 0
      while (i < so.length) {
        if (((n >>> so(i)) & mask) == mask) throw PetriNet.PackedOverflow
        n += (1L << so(i)); i += 1
      }
      n
    }

    def pack(m: Map[String, Int]): Long = {
      var out = 0L
      m.foreach { case (p, c) =>
        if (c < 0 || c > mask) throw PetriNet.PackedOverflow
        out |= c.toLong << (pIdx(p) * bits)
      }
      out
    }

    var total = 0
    @inline def budget(): Unit = {
      total += 1
      if (total > maxStates)
        throw new IllegalStateException(s"state space exceeds $maxStates")
    }

    def tauClose(frontier: PetriNet.LongBuf, seen: PetriNet.LongSet): Unit = {
      var i = 0
      while (i < frontier.size) {
        val m = frontier(i)
        var ti = 0
        while (ti < tauIdx.length) {
          val t = tauIdx(ti)
          if (enabledP(m, t)) {
            val n = fireP(m, t)
            if (seen.add(n)) { budget(); frontier += n }
          }
          ti += 1
        }
        i += 1
      }
    }

    val init = pack(initialMarking)
    var frontier = new PetriNet.LongBuf
    frontier += init
    var seen = new PetriNet.LongSet
    seen.add(init)
    tauClose(frontier, seen)

    val it = trace.iterator
    while (it.hasNext) {
      val a = it.next()
      val ts = byLabel.getOrElse(a, Array.empty[Int])
      val next = new PetriNet.LongBuf
      val nextSeen = new PetriNet.LongSet
      var i = 0
      while (i < frontier.size) {
        val m = frontier(i)
        var k = 0
        while (k < ts.length) {
          val t = ts(k)
          if (enabledP(m, t)) {
            val n = fireP(m, t)
            if (nextSeen.add(n)) { budget(); next += n }
          }
          k += 1
        }
        i += 1
      }
      if (next.size == 0) return false
      frontier = next
      seen = nextSeen
      tauClose(frontier, seen)
    }

    val target = pack(finalMarking)
    var i = 0
    while (i < frontier.size) {
      if (frontier(i) == target) return true
      i += 1
    }
    false
  }

  /** Classical workflow-net soundness via explicit state-space
    * exploration (nets here are model-sized — alphabet-scale — so the
    * reachability graph is small; `maxStates` guards degenerate
    * inputs, reporting `bounded = false` instead of looping).
    *
    *  - `optionToComplete`: from every reachable marking the final
    *    marking is reachable;
    *  - `properCompletion`: no reachable marking strictly covers the
    *    final marking;
    *  - `deadTransitions`: transitions enabled in no reachable
    *    marking.
    *
    * `sound` = all three (and bounded).
    */
  def soundness(maxStates: Int = 100000): PetriNet.Soundness = {
    type M = Map[String, Int]
    def pos(m: M): M = m.filter(_._2 > 0)
    val target = pos(finalMarking)

    val start = pos(initialMarking)
    val seen = scala.collection.mutable.Set[M](start)
    val queue = scala.collection.mutable.Queue(start)
    val preds = scala.collection.mutable.Map.empty[M, List[M]]
    val fired = scala.collection.mutable.Set.empty[String]
    var bounded = true
    var proper = true
    while (queue.nonEmpty && bounded) {
      val m = queue.dequeue()
      // proper completion: no reachable marking strictly covers final
      if (target.nonEmpty && m != target &&
          target.forall { case (p, n) => m.getOrElse(p, 0) >= n })
        proper = false
      transitions.foreach { t =>
        if (enabled(m, t.id)) {
          fired += t.id
          val next = pos(fire(m, t.id))
          preds(next) = m :: preds.getOrElse(next, Nil)
          if (seen.add(next)) {
            if (seen.size > maxStates) bounded = false
            else queue.enqueue(next)
          }
        }
      }
    }

    if (!bounded)
      PetriNet.Soundness(bounded = false, optionToComplete = false,
        properCompletion = false, deadTransitions = Set.empty)
    else {
      // reverse reachability from the final marking
      val canFinish = scala.collection.mutable.Set.empty[M]
      if (seen.contains(target)) {
        val bq = scala.collection.mutable.Queue(target)
        canFinish += target
        while (bq.nonEmpty) {
          val m = bq.dequeue()
          preds.getOrElse(m, Nil).foreach { p =>
            if (canFinish.add(p)) bq.enqueue(p)
          }
        }
      }
      PetriNet.Soundness(
        bounded = true,
        optionToComplete = seen.forall(canFinish.contains),
        properCompletion = proper,
        deadTransitions = transitions.map(_.id).toSet -- fired)
    }
  }
}

object PetriNet {

  /** Control signal: a token count no longer fits its packed field —
    * abort the packed acceptance and re-run on int arrays. Stackless
    * (a shared singleton), so the abort costs nothing. */
  private[ops] case object PackedOverflow
    extends scala.util.control.ControlThrowable

  /** Minimal growable Long array (no boxing). */
  private[ops] final class LongBuf {
    private var a = new Array[Long](16)
    private var n = 0
    def size: Int = n
    def apply(i: Int): Long = a(i)
    def +=(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
  }

  /** Minimal open-addressing Long hash set (no boxing). 0 is handled
    * via a presence flag so the empty-slot sentinel stays free. */
  private[ops] final class LongSet {
    private var cap = 64
    private var keys = new Array[Long](cap)
    private var n = 0
    private var hasZero = false
    private def mix(v: Long): Int = {
      // splitmix64 finalizer
      var z = v + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & (cap - 1)).toInt
    }
    /** True iff v was not present. */
    def add(v: Long): Boolean = {
      if (v == 0L) {
        if (hasZero) return false
        hasZero = true; return true
      }
      var i = mix(v)
      while (keys(i) != 0L) {
        if (keys(i) == v) return false
        i = (i + 1) & (cap - 1)
      }
      keys(i) = v; n += 1
      if (n * 4 > cap * 3) grow()
      true
    }
    private def grow(): Unit = {
      val old = keys
      cap *= 2
      keys = new Array[Long](cap)
      n = 0
      var i = 0
      while (i < old.length) {
        val v = old(i)
        if (v != 0L) {
          var j = mix(v)
          while (keys(j) != 0L) j = (j + 1) & (cap - 1)
          keys(j) = v; n += 1
        }
        i += 1
      }
    }
  }

  /** Result of [[PetriNet.soundness]]. */
  case class Soundness(bounded: Boolean, optionToComplete: Boolean,
      properCompletion: Boolean, deadTransitions: Set[String]) {
    def sound: Boolean =
      bounded && optionToComplete && properCompletion && deadTransitions.isEmpty
  }
  case class Transition(id: String, label: Option[String])

  /** Compiles a process tree into a workflow net via the standard
    * compositional construction: every node translates between an
    * entry and an exit place; `and` adds silent split/join
    * transitions, `loop` adds silent enter/exit transitions around
    * the body's entry/exit places so redo parts cycle between them.
    */
  def fromTree(tree: ProcessTree): PetriNet = {
    import ProcessTree._
    val places = Seq.newBuilder[String]
    val trans = Seq.newBuilder[Transition]
    val arcs = Seq.newBuilder[(String, String)]
    var n = 0
    def place(): String = { n += 1; val p = s"p$n"; places += p; p }
    def tr(label: Option[String]): String = {
      n += 1; val id = s"t$n"; trans += Transition(id, label); id
    }
    def go(node: ProcessTree, in: String, out: String): Unit = node match {
      case Leaf(a) =>
        val x = tr(Some(a)); arcs += (in -> x) += (x -> out)
      case Tau =>
        val x = tr(None); arcs += (in -> x) += (x -> out)
      case Sequence(cs) =>
        val mids = cs.init.map(_ => place())
        cs.zip(in +: mids).zip(mids :+ out).foreach {
          case ((c, i), o) => go(c, i, o)
        }
      case Xor(cs) => cs.foreach(go(_, in, out))
      case And(cs) =>
        val split = tr(None); val join = tr(None)
        arcs += (in -> split) += (join -> out)
        cs.foreach { c =>
          val pi = place(); val po = place()
          arcs += (split -> pi) += (po -> join)
          go(c, pi, po)
        }
      case Loop(cs) =>
        val pIn = place(); val pOut = place()
        val tIn = tr(None); val tOut = tr(None)
        arcs += (in -> tIn) += (tIn -> pIn) += (pOut -> tOut) += (tOut -> out)
        go(cs.head, pIn, pOut)
        cs.tail.foreach(r => go(r, pOut, pIn))
    }
    val src = place(); val snk = place()
    go(tree, src, snk)
    PetriNet(places.result(), trans.result(), arcs.result(),
      Map(src -> 1), Map(snk -> 1))
  }

  /** [[Alpha.WorkflowNet]] → explicit net: activities become labeled
    * transitions; the implicit source/sink places and the mined places
    * become real places (same semantics [[Replay]] replays). */
  def fromWorkflowNet(net: Alpha.WorkflowNet): PetriNet = {
    val actIds = net.activities.toSeq.sorted.zipWithIndex
      .map { case (a, i) => a -> s"t${i + 1}" }.toMap
    val trans = actIds.toSeq.sortBy(_._2.drop(1).toInt)
      .map { case (a, id) => Transition(id, Some(a)) }
    val minedIdx = net.places.toSeq.zipWithIndex
    val arcs = Seq.newBuilder[(String, String)]
    net.startActivities.foreach(a => arcs += ("source" -> actIds(a)))
    net.endActivities.foreach(a => arcs += (actIds(a) -> "sink"))
    minedIdx.foreach { case (p, i) =>
      val pid = s"p${i + 1}"
      p.inputs.foreach(a => arcs += (actIds(a) -> pid))
      p.outputs.foreach(a => arcs += (pid -> actIds(a)))
    }
    PetriNet(
      "source" +: minedIdx.map(pi => s"p${pi._2 + 1}") :+ "sink",
      trans, arcs.result(), Map("source" -> 1), Map("sink" -> 1))
  }
}
