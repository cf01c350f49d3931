package graft.ops

import java.io.StringReader

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** PNML (ISO/IEC 15909-2) serialization of [[PetriNet]] — the
  * interchange format of the process-mining tool ecosystem, so nets
  * discovered here ([[Alpha]], [[Inductive]]) can move to/from other
  * tools. P/T-net subset: places with `initialMarking`, transitions
  * with `name` (a transition WITHOUT a name element is a silent τ
  * transition), unweighted arcs, plus the widely-used `finalmarkings`
  * extension element for the target marking.
  */
object Pnml {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  def write(net: PetriNet, netId: String = "net1"): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<pnml xmlns=\"http://www.pnml.org/version-2009/grammar/pnml\">\n"
    sb ++= s"""  <net id="${esc(netId)}" type="http://www.pnml.org/version-2009/grammar/ptnet">\n"""
    sb ++= "    <page id=\"page1\">\n"
    net.places.foreach { p =>
      val mark = net.initialMarking.getOrElse(p, 0)
      sb ++= s"""      <place id="${esc(p)}">"""
      if (mark > 0) sb ++= s"<initialMarking><text>$mark</text></initialMarking>"
      sb ++= "</place>\n"
    }
    net.transitions.foreach { t =>
      sb ++= s"""      <transition id="${esc(t.id)}">"""
      t.label.foreach(l => sb ++= s"<name><text>${esc(l)}</text></name>")
      sb ++= "</transition>\n"
    }
    net.arcs.zipWithIndex.foreach { case ((s, d), i) =>
      sb ++= s"""      <arc id="a${i + 1}" source="${esc(s)}" target="${esc(d)}"/>\n"""
    }
    sb ++= "    </page>\n"
    if (net.finalMarking.nonEmpty) {
      sb ++= "    <finalmarkings>\n      <marking>\n"
      net.finalMarking.toSeq.sortBy(_._1).foreach { case (p, k) =>
        sb ++= s"""        <place idref="${esc(p)}"><text>$k</text></place>\n"""
      }
      sb ++= "      </marking>\n    </finalmarkings>\n"
    }
    sb ++= "  </net>\n</pnml>\n"
    sb.toString
  }

  /** Parses the subset [[write]] emits (plus tolerant of unknown
    * elements). Returns the net; a transition with no `name` is τ. */
  def parse(xml: String): PetriNet = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new StringReader(xml))

    val places = Seq.newBuilder[String]
    val trans = Seq.newBuilder[PetriNet.Transition]
    val arcs = Seq.newBuilder[(String, String)]
    var initial = Map.empty[String, Int]
    var finalM = Map.empty[String, Int]

    // cursor state
    var curPlace: String = null          // inside <place>
    var curTrans: String = null          // inside <transition>
    var curLabel: Option[String] = None
    var inName = false; var inInitMark = false; var inFinal = false
    var finalRef: String = null
    var text = new StringBuilder

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "place" if !inFinal =>
              curPlace = r.getAttributeValue(null, "id"); places += curPlace
            case "place" if inFinal =>
              finalRef = r.getAttributeValue(null, "idref")
            case "transition" =>
              curTrans = r.getAttributeValue(null, "id"); curLabel = None
            case "arc" =>
              arcs += (r.getAttributeValue(null, "source") ->
                r.getAttributeValue(null, "target"))
            case "name" if curTrans != null => inName = true
            case "initialMarking" if curPlace != null => inInitMark = true
            case "finalmarkings" => inFinal = true
            case "text" => text = new StringBuilder
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS => text ++= r.getText
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "text" =>
              if (inName) curLabel = Some(text.toString)
              else if (inInitMark) initial += (curPlace -> text.toString.trim.toInt)
              else if (inFinal && finalRef != null)
                finalM += (finalRef -> text.toString.trim.toInt)
            case "name" => inName = false
            case "initialMarking" => inInitMark = false
            case "finalmarkings" => inFinal = false
            case "place" if inFinal => finalRef = null
            case "place" => curPlace = null
            case "transition" =>
              trans += PetriNet.Transition(curTrans, curLabel); curTrans = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    PetriNet(places.result(), trans.result(), arcs.result(), initial, finalM)
  }
}
