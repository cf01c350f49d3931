package graft.xes

import XesModel._

/** Semantic validation of parsed logs — the analogue of the
  * reference's `Validator` handler
  * (`/root/reference/src/stream/validator.rs:19-116`) plus the
  * corpus-classifying checks the reference documents as "most of these
  * error classes can be caught by XesValidator" (xes.rs:912-915) but
  * does not implement yet.
  *
  * Reference-faithful rules:
  *  - R1 classifier names must be valid `xs:NCName`s
  *    (validator.rs:84-91, xml_util.rs:89-147);
  *  - R2 global declarations: every component in scope must carry each
  *    declared key with the declared type (component.rs:51-72);
  *  - R3 when the Time extension is declared: every event needs a
  *    `date time:timestamp`, and each trace's events must be
  *    chronological (time.rs:129-153 validator, view :92-127).
  *
  * Beyond-reference rules (classify the rest of the non_validating
  * corpus; each cites its witness file):
  *  - R4 classifier keys non-empty and resolvable — each key appears
  *    in some global declaration or carries a declared extension
  *    prefix (classifier_empty_keys, classifier_incorrect_key);
  *  - R5 no duplicate direct attribute keys on a component or global
  *    (event_identical_attributes);
  *  - R6 `id` values must be UUIDs (id_incorrect_value);
  *  - R7 `list` attributes need at least one member
  *    (list_no_values, list_empty_values);
  *  - R8 nested attribute content requires the `nested-attributes`
  *    feature flag (string_nested_not_declared, list_two_values);
  *  - R9 component order: no trace after a standalone event — the
  *    observer state machine (observer.rs:90-100, misplaced_trace_event);
  *  - R10 a prefixed attribute key requires its extension prefix to be
  *    declared (extension_not_declared).
  *
  * Deliberately NOT enforced (matching the reference's Validator,
  * which passes these too): a declared-but-unused `nested-attributes`
  * feature (string_not_nested_but_declared, log_no_nested_attributes).
  */
object XesValidator {

  private val Uuid =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  /** All violations in a parsed log; empty = valid. */
  def validate(log: ParsedLog): Seq[String] = {
    val v = Seq.newBuilder[String]
    val meta = log.meta
    val declaredPrefixes = meta.extensions.map(_.prefix).toSet
    val globalKeys = meta.globals.flatMap(_.attrs.map(_.key)).toSet

    // R1 — classifier names NCName (full W3C tables via XmlLexical —
    // a legal non-ASCII name like 'Überweisung' must pass)
    meta.classifiers.foreach { c =>
      if (!XmlLexical.isNcName(c.name))
        v += s"classifier name '${c.name}' is no valid xs:NCName"
    }

    // R4 — classifier keys resolvable
    meta.classifiers.foreach { c =>
      val keys = c.keys.trim.split("\\s+").filter(_.nonEmpty)
      if (keys.isEmpty) v += s"classifier '${c.name}' has no keys"
      keys.foreach { k =>
        val prefixed = k.contains(':') &&
          declaredPrefixes.contains(k.takeWhile(_ != ':'))
        if (!globalKeys.contains(k) && !prefixed)
          v += s"classifier '${c.name}' key '$k' matches no global or declared extension"
      }
    }

    // R2 — globals presence + type
    val traceGlobals = meta.globals.filter(_.scope == "trace").flatMap(_.attrs)
    val eventGlobals = meta.globals.filter(_.scope == "event").flatMap(_.attrs)
    def checkGlobals(kind: String, ident: String, attrs: Seq[XAttr],
        decls: Seq[XAttr]): Unit =
      decls.foreach { d =>
        attrs.find(_.key == d.key) match {
          case None =>
            v += s"$kind $ident misses global attribute '${d.key}'"
          case Some(a) if a.xtype != d.xtype =>
            v += s"$kind $ident attribute '${d.key}' has type ${a.xtype}, global declares ${d.xtype}"
          case _ => ()
        }
      }
    log.traces.foreach(t => checkGlobals("trace", t.traceIdx.toString, t.attrs, traceGlobals))
    log.events.foreach(e => checkGlobals("event",
      s"${e.traceIdx.map(_.toString).getOrElse("-")}/${e.seq}", e.attrs, eventGlobals))

    // R3 — Time extension: timestamps present + chronological per trace
    if (declaredPrefixes.contains("time")) {
      log.events.foreach { e =>
        if (e.tsMicros.isEmpty)
          v += s"event ${e.traceIdx.map(_.toString).getOrElse("-")}/${e.seq} has no date 'time:timestamp' but Time is declared"
      }
      log.events.filter(e => e.traceIdx.isDefined && e.tsMicros.isDefined)
        .groupBy(_.traceIdx.get).foreach { case (idx, es) =>
          val ordered = es.sortBy(_.seq).map(_.tsMicros.get)
          if (ordered.zip(ordered.tail).exists { case (a, b) => b < a })
            v += s"trace $idx events are not in chronological order"
        }
    }

    // R5 — duplicate direct attribute keys
    def dupKeys(attrs: Seq[XAttr]): Seq[String] =
      attrs.groupBy(_.key).collect { case (k, as) if as.size > 1 => k }.toSeq
    dupKeys(meta.attrs).foreach(k => v += s"log has duplicate attribute '$k'")
    meta.globals.foreach(g => dupKeys(g.attrs).foreach(k =>
      v += s"global scope=${g.scope} has duplicate attribute '$k'"))
    log.traces.foreach(t => dupKeys(t.attrs).foreach(k =>
      v += s"trace ${t.traceIdx} has duplicate attribute '$k'"))
    log.events.foreach(e => dupKeys(e.attrs).foreach(k =>
      v += s"event ${e.traceIdx.map(_.toString).getOrElse("-")}/${e.seq} has duplicate attribute '$k'"))

    // R6/R7/R8/R10 — walk all attribute trees
    var nestedContent = false
    def checkKey(where: String, key: String): Unit =
      if (key.contains(':') &&
          !declaredPrefixes.contains(key.takeWhile(_ != ':')))
        v += s"$where attribute '$key' uses an undeclared extension prefix"
    def walk(where: String, a: XAttr): Unit = {
      if (a.children.nonEmpty) nestedContent = true
      checkKey(where, a.key)
      if (a.xtype == "id" && Uuid.findFirstIn(a.value).isEmpty)
        v += s"$where id attribute '${a.key}' value '${a.value}' is not a UUID"
      if (a.xtype == "list" && a.children.isEmpty)
        v += s"$where list attribute '${a.key}' has no values"
      a.children.foreach { c1 =>
        checkKey(where, c1.key)
        if (c1.xtype == "id" && Uuid.findFirstIn(c1.value).isEmpty)
          v += s"$where nested id '${c1.key}' value '${c1.value}' is not a UUID"
        if (c1.xtype == "list" && c1.children.isEmpty)
          v += s"$where nested list '${c1.key}' has no values"
        if (c1.children.nonEmpty) nestedContent = true
      }
    }
    meta.attrs.foreach(a => walk("log", a))
    meta.globals.foreach(g => g.attrs.foreach(a => walk(s"global ${g.scope}", a)))
    log.traces.foreach(t => t.attrs.foreach(a => walk(s"trace ${t.traceIdx}", a)))
    log.events.foreach(e => e.attrs.foreach(a => walk(s"event ${e.seq}", a)))

    val features = meta.xmlAttrs.getOrElse("xes.features", "")
    if (nestedContent && !features.split("\\s+").contains("nested-attributes"))
      v += "log uses nested attributes but does not declare the 'nested-attributes' feature"

    // R9 — component order (trace after standalone event)
    val standalonePos = log.events.filter(_.traceIdx.isEmpty).map(_.filePos)
    if (standalonePos.nonEmpty && log.traces.nonEmpty &&
        log.traces.map(_.filePos).max > standalonePos.min)
      v += "trace appears after a standalone event (component order violation)"

    v.result()
  }

  def isValid(log: ParsedLog): Boolean = validate(log).isEmpty

  /** Repair pass (reference `repair.rs:22-58`): classifier names that
    * are not valid NCNames get their whitespace stripped. Returns the
    * repaired log. */
  def repair(log: ParsedLog): ParsedLog = {
    val fixed = log.meta.classifiers.map { c =>
      if (!XmlLexical.isNcName(c.name))
        c.copy(name = c.name.replaceAll("\\s", ""))
      else c
    }
    log.copy(meta = log.meta.copy(classifiers = fixed))
  }
}
