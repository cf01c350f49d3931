package graft.xes

import org.apache.spark.sql.{Dataset, SparkSession}

import XesModel._

/** XES XML serializer — inverse of [[XesParser]] (reference
  * `/root/reference/src/stream/xes.rs:717-784`). Attribute values are
  * re-emitted from their stored lexical form, so a parse→write→parse
  * round trip is semantically the identity and successive writes are
  * byte-identical (the reference's round-trip test, xes.rs:966-1005).
  *
  * Per-trace rendering is embarrassingly parallel; the log header and
  * footer are tiny driver-side strings (SURVEY.md §2.2 XesWriter row).
  * [[toXmlStrings]] assembles whole files distributed per file — one
  * log per output row (XML is an exchange format; a log that does not
  * fit one executor row should live in parquet, not XES).
  */
object XesWriter {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&apos;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def renderLeaf(sb: StringBuilder, ind: String, key: String,
      xtype: String, value: String, hasChildren: Boolean,
      body: StringBuilder => Unit): Unit = {
    sb.append(ind).append('<').append(xtype)
      .append(" key=\"").append(esc(key)).append('"')
    if (xtype != "list") sb.append(" value=\"").append(esc(value)).append('"')
    if (!hasChildren) sb.append("/>\n")
    else {
      sb.append(">\n")
      body(sb)
      sb.append(ind).append("</").append(xtype).append(">\n")
    }
  }

  private def renderA2(sb: StringBuilder, ind: String, a: XA2): Unit =
    renderLeaf(sb, ind, a.key, a.xtype, a.value, hasChildren = false, _ => ())

  private def renderA1(sb: StringBuilder, ind: String, a: XA1): Unit =
    renderLeaf(sb, ind, a.key, a.xtype, a.value, a.children.nonEmpty, { sb2 =>
      val inner = ind + "\t"
      if (a.xtype == "list") {
        sb2.append(inner).append("<values>\n")
        a.children.foreach(c => renderA2(sb2, inner + "\t", c))
        sb2.append(inner).append("</values>\n")
      } else a.children.foreach(c => renderA2(sb2, inner, c))
    })

  def renderAttr(sb: StringBuilder, ind: String, a: XAttr): Unit =
    renderLeaf(sb, ind, a.key, a.xtype, a.value, a.children.nonEmpty, { sb2 =>
      val inner = ind + "\t"
      if (a.xtype == "list") {
        sb2.append(inner).append("<values>\n")
        a.children.foreach(c => renderA1(sb2, inner + "\t", c))
        sb2.append(inner).append("</values>\n")
      } else a.children.foreach(c => renderA1(sb2, inner, c))
    })

  /** Log header through the end of meta (everything before the first
    * trace). Deterministic: xml attrs in insertion-stable sorted key
    * order. */
  def renderHeader(meta: XesMeta): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<log")
    meta.xmlAttrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(' ').append(k).append("=\"").append(esc(v)).append('"')
    }
    sb.append(">\n")
    meta.extensions.foreach { e =>
      sb.append("\t<extension name=\"").append(esc(e.name))
        .append("\" prefix=\"").append(esc(e.prefix))
        .append("\" uri=\"").append(esc(e.uri)).append("\"/>\n")
    }
    meta.globals.foreach { g =>
      sb.append("\t<global scope=\"").append(g.scope).append("\">\n")
      g.attrs.foreach(a => renderAttr(sb, "\t\t", a))
      sb.append("\t</global>\n")
    }
    meta.classifiers.foreach { c =>
      sb.append("\t<classifier name=\"").append(esc(c.name))
        .append("\" scope=\"").append(c.scope)
        .append("\" keys=\"").append(esc(c.keys)).append("\"/>\n")
    }
    meta.attrs.foreach(a => renderAttr(sb, "\t", a))
    sb.toString
  }

  def renderEvent(e: XesEvent, ind: String): String = {
    val sb = new StringBuilder
    sb.append(ind).append("<event>\n")
    e.attrs.foreach(a => renderAttr(sb, ind + "\t", a))
    sb.append(ind).append("</event>\n")
    sb.toString
  }

  def renderTrace(t: XesTrace, events: Seq[XesEvent]): String = {
    val sb = new StringBuilder
    sb.append("\t<trace>\n")
    t.attrs.foreach(a => renderAttr(sb, "\t\t", a))
    events.sortBy(_.seq).foreach(e => sb.append(renderEvent(e, "\t\t")))
    sb.append("\t</trace>\n")
    sb.toString
  }

  /** Driver-side whole-log render (for corpus-sized logs / tests). */
  def render(log: ParsedLog): String = {
    val sb = new StringBuilder(renderHeader(log.meta))
    val byTrace = log.events.filter(_.traceIdx.isDefined)
      .groupBy(_.traceIdx.get)
    log.traces.sortBy(_.traceIdx).foreach { t =>
      sb.append(renderTrace(t, byTrace.getOrElse(t.traceIdx, Nil)))
    }
    log.events.filter(_.traceIdx.isEmpty).sortBy(_.seq)
      .foreach(e => sb.append(renderEvent(e, "\t")))
    sb.append("</log>\n")
    sb.toString
  }

  /** Distributed render: one (file, xml) row per input log. Traces are
    * rendered in parallel from the cogroup of traces and events; the
    * header comes from the broadcast meta map. */
  def toXmlStrings(spark: SparkSession, xlog: XesReader.XLog): Dataset[(String, String)] = {
    import spark.implicits._
    val metaByFile = spark.sparkContext.broadcast(
      xlog.metas.map(m => m.file -> m).toMap)
    xlog.traces.groupByKey(_.file)
      .cogroup(xlog.events.groupByKey(_.file)) { case (file, ts, es) =>
        val meta = metaByFile.value(file)
        val sb = new StringBuilder(renderHeader(meta))
        val events = es.toSeq
        val byTrace = events.filter(_.traceIdx.isDefined).groupBy(_.traceIdx.get)
        ts.toSeq.sortBy(_.traceIdx).foreach { t =>
          sb.append(renderTrace(t, byTrace.getOrElse(t.traceIdx, Nil)))
        }
        events.filter(_.traceIdx.isEmpty).sortBy(_.seq)
          .foreach(e => sb.append(renderEvent(e, "\t")))
        sb.append("</log>\n")
        Iterator((file, sb.toString))
      }
  }
}
