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

  private def renderA1(sb: StringBuilder, ind: String, a: XA1, tab: String): Unit =
    renderLeaf(sb, ind, a.key, a.xtype, a.value, a.children.nonEmpty, { sb2 =>
      val inner = ind + tab
      if (a.xtype == "list") {
        sb2.append(inner).append("<values>\n")
        a.children.foreach(c => renderA2(sb2, inner + tab, c))
        sb2.append(inner).append("</values>\n")
      } else a.children.foreach(c => renderA2(sb2, inner, c))
    })

  def renderAttr(sb: StringBuilder, ind: String, a: XAttr, tab: String = "\t"): Unit =
    renderLeaf(sb, ind, a.key, a.xtype, a.value, a.children.nonEmpty, { sb2 =>
      val inner = ind + tab
      if (a.xtype == "list") {
        sb2.append(inner).append("<values>\n")
        a.children.foreach(c => renderA1(sb2, inner + tab, c, tab))
        sb2.append(inner).append("</values>\n")
      } else a.children.foreach(c => renderA1(sb2, inner, c, tab))
    })

  /** Log header through the end of meta (everything before the first
    * trace). Deterministic: xml attrs in insertion-stable sorted key
    * order. */
  def renderHeader(meta: XesMeta, tab: String = "\t"): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<log")
    meta.xmlAttrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(' ').append(k).append("=\"").append(esc(v)).append('"')
    }
    sb.append(">\n")
    meta.extensions.foreach { e =>
      sb.append(tab).append("<extension name=\"").append(esc(e.name))
        .append("\" prefix=\"").append(esc(e.prefix))
        .append("\" uri=\"").append(esc(e.uri)).append("\"/>\n")
    }
    meta.globals.foreach { g =>
      sb.append(tab).append("<global scope=\"").append(g.scope).append("\">\n")
      g.attrs.foreach(a => renderAttr(sb, tab * 2, a, tab))
      sb.append(tab).append("</global>\n")
    }
    meta.classifiers.foreach { c =>
      sb.append(tab).append("<classifier name=\"").append(esc(c.name))
        .append("\" scope=\"").append(c.scope)
        .append("\" keys=\"").append(esc(c.keys)).append("\"/>\n")
    }
    meta.attrs.foreach(a => renderAttr(sb, tab, a, tab))
    sb.toString
  }

  def renderEvent(e: XesEvent, ind: String, tab: String = "\t"): String = {
    val sb = new StringBuilder
    sb.append(ind).append("<event>\n")
    e.attrs.foreach(a => renderAttr(sb, ind + tab, a, tab))
    sb.append(ind).append("</event>\n")
    sb.toString
  }

  def renderTrace(t: XesTrace, events: Seq[XesEvent], tab: String = "\t"): String = {
    val sb = new StringBuilder
    sb.append(tab).append("<trace>\n")
    t.attrs.foreach(a => renderAttr(sb, tab * 2, a, tab))
    events.sortBy(_.seq).foreach(e => sb.append(renderEvent(e, tab * 2, tab)))
    sb.append(tab).append("</trace>\n")
    sb.toString
  }

  /** Driver-side whole-log render (for corpus-sized logs / tests).
    * `tab` is the per-level indent unit — "\t" matches the parser's
    * own output; "\t" * n implements the reference writer's `indent`
    * attribute (xes.rs:799-856, `with_indent(b'\t', n)`); "" renders
    * flush-left (newlines are kept — unlike quick-xml's no-indent
    * single-line mode — so output stays diffable). */
  def render(log: ParsedLog, tab: String = "\t"): String = {
    val sb = new StringBuilder(renderHeader(log.meta, tab))
    val byTrace = log.events.filter(_.traceIdx.isDefined)
      .groupBy(_.traceIdx.get)
    log.traces.sortBy(_.traceIdx).foreach { t =>
      sb.append(renderTrace(t, byTrace.getOrElse(t.traceIdx, Nil), tab))
    }
    log.events.filter(_.traceIdx.isEmpty).sortBy(_.seq)
      .foreach(e => sb.append(renderEvent(e, tab, tab)))
    sb.append("</log>\n")
    sb.toString
  }

  /** Distributed render: one (file, xml) row per input log. Traces are
    * rendered in parallel from the cogroup of traces and events; the
    * header comes from the broadcast meta map. */
  def toXmlStrings(spark: SparkSession, xlog: XesReader.XLog,
      tab: String = "\t"): Dataset[(String, String)] = {
    import spark.implicits._
    val metaByFile = spark.sparkContext.broadcast(
      xlog.metas.map(m => m.file -> m).toMap)
    xlog.traces.groupByKey(_.file)
      .cogroup(xlog.events.groupByKey(_.file)) { case (file, ts, es) =>
        val meta = metaByFile.value(file)
        val sb = new StringBuilder(renderHeader(meta, tab))
        val events = es.toSeq
        val byTrace = events.filter(_.traceIdx.isDefined).groupBy(_.traceIdx.get)
        ts.toSeq.sortBy(_.traceIdx).foreach { t =>
          sb.append(renderTrace(t, byTrace.getOrElse(t.traceIdx, Nil), tab))
        }
        events.filter(_.traceIdx.isEmpty).sortBy(_.seq)
          .foreach(e => sb.append(renderEvent(e, tab, tab)))
        sb.append("</log>\n")
        Iterator((file, sb.toString))
      }
  }
}
