package graft.ops

import graft.SparkSpec

/** DOT export: byte-stable, escaped, structurally complete. */
class DotSpec extends SparkSpec {

  import spark.implicits._

  test("dfg: sorted, labeled, start/end markers, hostile labels escaped") {
    val edges = Seq(("a \"x\"", "b", 3L), ("b", "a \"x\"", 1L))
      .toDF("act_from", "act_to", "n")
    val dot = Dot.dfg(edges, starts = Seq("a \"x\""), ends = Seq("b"))
    assert(dot.startsWith("digraph dfg {"))
    assert(dot.contains("\"a \\\"x\\\"\" -> \"b\" [label=\"3\"];"))
    assert(dot.contains("__start -> \"a \\\"x\\\"\";"))
    assert(dot.contains("\"b\" -> __end;"))
    // byte-stable
    assert(dot == Dot.dfg(edges, starts = Seq("a \"x\""), ends = Seq("b")))
  }

  test("petri: markings and tau transitions rendered distinctly") {
    val net = PetriNet(
      places = Seq("p1", "p2"),
      transitions = Seq(PetriNet.Transition("t1", Some("go")),
        PetriNet.Transition("t2", None)),
      arcs = Seq(("p1", "t1"), ("t1", "p2"), ("p2", "t2")),
      initialMarking = Map("p1" -> 1),
      finalMarking = Map("p2" -> 1))
    val dot = Dot.petri(net)
    assert(dot.contains("\"p1\" [shape=circle,style=filled,fillcolor=gray];"))
    assert(dot.contains("\"p2\" [shape=circle,peripheries=2];"))
    assert(dot.contains("\"t1\" [shape=box,label=\"go\"];"))
    assert(dot.contains("fillcolor=black")) // tau sliver
    assert(dot.contains("\"p1\" -> \"t1\";"))
  }
}
