package graft.ops

import org.apache.spark.sql.DataFrame

/** Graphviz DOT export — the lingua franca every process-mining tool
  * renders (reference models ship as rendered nets in its docs; this
  * is the interchange step for ours). Model-sized, driver-side by
  * design: a DFG or net has alphabet-scale nodes, never event-scale.
  *
  * Determinism: nodes and edges are emitted in sorted order, so the
  * same model always serializes to the same bytes (diff-able,
  * snapshot-testable).
  */
object Dot {

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** DFG edge list (`act_from`, `act_to`, `n`) → DOT digraph with
    * edge-frequency labels; optional start/end activity markers drawn
    * as point nodes.
    */
  def dfg(edges: DataFrame, starts: Seq[String] = Nil,
      ends: Seq[String] = Nil): String = {
    val es = edges.select("act_from", "act_to", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val sb = new StringBuilder("digraph dfg {\n  rankdir=LR;\n")
    sb ++= "  node [shape=box];\n"
    nodes.foreach(nm => sb ++= s"  ${q(nm)};\n")
    starts.sorted.foreach { s =>
      sb ++= s"  __start [shape=point]; __start -> ${q(s)};\n"
    }
    ends.sorted.foreach { e =>
      sb ++= s"  ${q(e)} -> __end; __end [shape=point];\n"
    }
    es.foreach { case (a, b, n) =>
      sb ++= s"  ${q(a)} -> ${q(b)} [label=${q(n.toString)}];\n"
    }
    sb ++= "}\n"
    sb.toString
  }

  /** Petri net → DOT: places as circles (initial marking filled,
    * final marking double-circled), labeled transitions as boxes,
    * τ transitions as filled slivers.
    */
  def petri(net: PetriNet): String = {
    val sb = new StringBuilder("digraph net {\n  rankdir=LR;\n")
    net.places.sorted.foreach { p =>
      val attrs = Seq("shape=circle") ++
        (if (net.initialMarking.getOrElse(p, 0) > 0) Seq("style=filled", "fillcolor=gray") else Nil) ++
        (if (net.finalMarking.getOrElse(p, 0) > 0) Seq("peripheries=2") else Nil)
      sb ++= s"  ${q(p)} [${attrs.mkString(",")}];\n"
    }
    net.transitions.sortBy(_.id).foreach { t =>
      val attrs = t.label match {
        case Some(l) => s"shape=box,label=${q(l)}"
        case None => "shape=box,style=filled,fillcolor=black,label=\"\",width=0.1"
      }
      sb ++= s"  ${q(t.id)} [$attrs];\n"
    }
    net.arcs.sorted.foreach { case (a, b) =>
      sb ++= s"  ${q(a)} -> ${q(b)};\n"
    }
    sb ++= "}\n"
    sb.toString
  }
}
