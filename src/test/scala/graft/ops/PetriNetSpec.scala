package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 packed-Long acceptance fast path against the generic
  * int-array frontier simulation: same results on τ-rich and/loop
  * nets, on >32-place nets (generic path only), and when a token
  * count overflows its packed field (fallback mid-trace). */
class PetriNetSpec extends AnyFunSuite {
  import ProcessTree._

  private def net(tree: ProcessTree): PetriNet = PetriNet.fromTree(tree)

  test("packed and generic acceptance agree on and/loop/xor/seq trees") {
    val trees = Seq(
      Sequence(Seq(Leaf("a"), Xor(Seq(And(Seq(Leaf("b"), Leaf("c"))),
        Leaf("e"))), Leaf("d"))),
      And(Seq(Loop(Seq(Leaf("a"), Tau)), Loop(Seq(Leaf("b"), Tau)),
        Loop(Seq(Leaf("c"), Tau)))),
      Loop(Seq(Sequence(Seq(Leaf("a"), Leaf("b"))), Leaf("r"))),
      Xor(Seq(Tau, Leaf("a"))))
    val traces = Seq(
      Seq.empty[String], Seq("a"), Seq("a", "b", "c", "d"),
      Seq("a", "c", "b", "d"), Seq("a", "e", "d"), Seq("b", "a", "c"),
      Seq("a", "b", "r", "a", "b"), Seq("c", "c", "a", "b"),
      Seq("a", "b"), Seq("x"), Seq("a", "a", "b", "b", "c", "c"))
    for (t <- trees; tr <- traces) {
      val n = net(t)
      // the public accepts() takes the packed path (≤ 32 places);
      // rebuilding the net with 40 padding places forces the generic
      // path over the SAME behavior — results must agree
      val padded = n.copy(places = n.places ++ (1 to 40).map(i => s"_pad$i"))
      assert(n.accepts(tr) == padded.accepts(tr),
        s"paths diverge on ${t.render} / ${tr.mkString(",")}")
    }
  }

  test("packed-field overflow falls back to the generic path mid-trace") {
    // 22 places → 2 bits per field (max 3 tokens); firing `a` four
    // times pushes place x to 4, overflowing its field — the packed
    // run aborts and the generic run must produce the answer
    val pads = (1 to 20).map(i => s"p$i")
    val n = PetriNet(
      places = Seq("i", "x") ++ pads,
      transitions = Seq(PetriNet.Transition("t1", Some("a")),
        PetriNet.Transition("t2", Some("done"))),
      arcs = Seq(("i", "t1"), ("t1", "i"), ("t1", "x"), ("i", "t2"),
        ("t2", "i")),
      initialMarking = Map("i" -> 1),
      finalMarking = Map("i" -> 1))
    // 4 tokens land on x, so the final marking {i:1} (x must be 0) is
    // NOT reached — and no exception escapes
    assert(!n.accepts(Seq("a", "a", "a", "a")))
    // trace that stays within the field agrees with hand expectation
    assert(!n.accepts(Seq("a")))
    assert(n.accepts(Seq("done")))
    assert(n.accepts(Seq.empty))
  }
}
