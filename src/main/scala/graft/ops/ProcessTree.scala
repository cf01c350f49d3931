package graft.ops

/** Process trees — the block-structured model family behind the
  * inductive miner (public IM literature: Leemans et al.; the
  * reference lists miners as its capability direction only,
  * `/root/reference/src/lib.rs:11-22`). A tree is a recursive
  * composition of four operators over activity leaves and the silent
  * leaf τ:
  *
  *  - `seq(c₁,…,cₙ)`  — children in order
  *  - `xor(c₁,…,cₙ)`  — exactly one child
  *  - `and(c₁,…,cₙ)`  — all children, interleaved
  *  - `loop(b,r₁,…,rₖ)` — `b (rᵢ b)*`: body once, then any number of
  *    (redo, body) rounds
  *
  * The canonical `render` string (children of the commutative
  * operators sorted) is the comparison form used by the specs.
  */
sealed trait ProcessTree {
  import ProcessTree._

  def render: String = this match {
    case Leaf(a) => a
    case Tau => "tau"
    case Sequence(cs) => cs.map(_.render).mkString("seq(", ",", ")")
    // xor/and are commutative: canonical form sorts the children
    case Xor(cs) => cs.map(_.render).sorted.mkString("xor(", ",", ")")
    case And(cs) => cs.map(_.render).sorted.mkString("and(", ",", ")")
    case Loop(cs) =>
      (cs.head.render +: cs.tail.map(_.render).sorted)
        .mkString("loop(", ",", ")")
  }

  def activities: Set[String] = this match {
    case Leaf(a) => Set(a)
    case Tau => Set.empty
    case Sequence(cs) => cs.flatMap(_.activities).toSet
    case Xor(cs) => cs.flatMap(_.activities).toSet
    case And(cs) => cs.flatMap(_.activities).toSet
    case Loop(cs) => cs.flatMap(_.activities).toSet
  }
}

object ProcessTree {
  case class Leaf(activity: String) extends ProcessTree
  case object Tau extends ProcessTree
  case class Sequence(children: Seq[ProcessTree]) extends ProcessTree
  case class Xor(children: Seq[ProcessTree]) extends ProcessTree
  case class And(children: Seq[ProcessTree]) extends ProcessTree
  /** `children.head` = body, `children.tail` = redo parts. */
  case class Loop(children: Seq[ProcessTree]) extends ProcessTree
}
