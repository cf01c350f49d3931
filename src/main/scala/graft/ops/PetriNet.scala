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
    * the initial marking to the final marking. Explicit-state BFS over
    * (marking, position) — nets compiled from trees/WF-nets are small
    * and near-safe, so the state space is tiny; `maxStates` guards
    * against degenerate inputs.
    */
  def accepts(trace: Seq[String], maxStates: Int = 200000): Boolean = {
    val start = (initialMarking, 0)
    val seen = scala.collection.mutable.Set[(Map[String, Int], Int)](start)
    val queue = scala.collection.mutable.Queue(start)
    val target = finalMarking.filter(_._2 > 0)
    while (queue.nonEmpty) {
      val (m, pos) = queue.dequeue()
      if (pos == trace.length && m.filter(_._2 > 0) == target) return true
      if (seen.size > maxStates)
        throw new IllegalStateException(s"state space exceeds $maxStates")
      transitions.foreach { t =>
        if (enabled(m, t.id)) {
          t.label match {
            case None =>
              val s = (fire(m, t.id), pos)
              if (seen.add(s)) queue.enqueue(s)
            case Some(a) if pos < trace.length && a == trace(pos) =>
              val s = (fire(m, t.id), pos + 1)
              if (seen.add(s)) queue.enqueue(s)
            case _ => ()
          }
        }
      }
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
