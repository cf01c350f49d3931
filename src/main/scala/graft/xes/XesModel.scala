package graft.xes

/** Data model for XES (IEEE Std 1849-2016) event logs, mapped to
  * Spark-friendly flat rows (SURVEY.md §1.4 mapping table).
  *
  * Replicates the component model of the reference
  * (`/root/reference/src/stream/core/component.rs:84-211`,
  * `attribute.rs:24-176`): a log = one Meta + ordered traces + ordered
  * standalone events; every component carries an ordered list of typed,
  * nestable attributes.
  *
  * Nesting is fixed at depth 3 (attribute → child → grandchild), per
  * SURVEY.md §7.4.4 — the corpus never exceeds depth 2; deeper input
  * is a parse error (documented limitation in place of the reference's
  * unbounded recursion). A `list` attribute's `<values>` members are
  * stored as its children.
  *
  * Event order within a trace is semantically load-bearing
  * (component.rs:155-160) — `seq` carries file position explicitly
  * because Spark rows are unordered (SURVEY.md §7.4.1).
  *
  * Timestamps are stored as UTC micros plus the source UTC offset in
  * minutes so the writer can reproduce the original RFC-3339 lexical
  * offset (SURVEY.md §7.4.6).
  */
object XesModel {

  /** Attribute type tags (attribute.rs:24-33). */
  val Types: Set[String] =
    Set("string", "date", "int", "float", "boolean", "id", "list")

  case class XA2(key: String, xtype: String, value: String)
  case class XA1(key: String, xtype: String, value: String,
    children: Seq[XA2] = Nil)
  case class XAttr(key: String, xtype: String, value: String,
    children: Seq[XA1] = Nil)

  case class ExtensionDecl(name: String, prefix: String, uri: String)
  case class GlobalDecl(scope: String, attrs: Seq[XAttr])
  case class ClassifierDecl(name: String, scope: String, keys: String)

  /** Log-level header (component.rs:84-90). `xmlAttrs` keeps the raw
    * `<log>` element attributes (xes.version, xes.features, …). */
  case class XesMeta(
    file: String,
    xmlAttrs: Map[String, String],
    extensions: Seq[ExtensionDecl],
    globals: Seq[GlobalDecl],
    classifiers: Seq[ClassifierDecl],
    attrs: Seq[XAttr])

  /** One trace row; its events live in the events table keyed by
    * (file, traceIdx). `filePos` = payload index at log level (traces
    * and standalone events share one counter) — carries the component
    * order the observer state machine enforces (observer.rs:90-100). */
  case class XesTrace(
    file: String,
    traceIdx: Long,
    filePos: Long,
    caseId: Option[String],
    nEvents: Long,
    attrs: Seq[XAttr])

  /** One event row. `traceIdx` None ⇒ standalone event ("a log
    * containing only events is also called a stream", log.rs:13-21).
    * Standard-extension attributes are promoted to typed columns;
    * `attrs` keeps the full ordered list for fidelity. */
  case class XesEvent(
    file: String,
    traceIdx: Option[Long],
    filePos: Long,
    seq: Long,
    activity: Option[String],
    instance: Option[String],
    lifecycle: Option[String],
    resource: Option[String],
    role: Option[String],
    group: Option[String],
    tsMicros: Option[Long],
    tzOffsetMin: Option[Int],
    attrs: Seq[XAttr])

  /** A parsed log: the in-memory (driver) form. */
  case class ParsedLog(meta: XesMeta, traces: Seq[XesTrace],
    events: Seq[XesEvent]) {
    /** [n_traces, n_events_in_traces, n_events_total] — the
      * Statistics triple (stats.rs:70-110). */
    def counts: Seq[Long] = {
      val inTraces = events.count(_.traceIdx.isDefined).toLong
      Seq(traces.size.toLong, inTraces, events.size.toLong)
    }
  }

  case class XesParseException(file: String, message: String)
    extends RuntimeException(s"$file: $message")
}
