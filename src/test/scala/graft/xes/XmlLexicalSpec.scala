package graft.xes

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's xml_util classification oracles
  * (`/root/reference/src/stream/xml_util.rs:170-265`) plus the
  * non-ASCII cases the old ASCII-only NCName check got wrong.
  */
class XmlLexicalSpec extends AnyFunSuite {

  import XmlLexical._

  test("Letter = BaseChar | Ideographic (reference char-level oracles)") {
    for (s <- Seq("a", "B", "z", "ß", "ᇂ", "ἕ", "ῆ", "〩", "龥", "一", "〡", "〇"))
      assert(isLetter(s.codePointAt(0)), s)
    for (s <- Seq("#", "*", "ੰ", "<", "\"", "°", "=", "_", "ໆ", "^", "+", "۹"))
      assert(!isLetter(s.codePointAt(0)), s)
  }

  test("xs:token (reference oracles)") {
    for (s <- Seq("foo bar", "fnord", "BAZ42", "")) assert(isToken(s), s)
    for (s <- Seq("foo  bar", " fnord", "ba 32 ", "a\tb", "a\nb"))
      assert(!isToken(s), s)
  }

  test("xs:Name (reference oracles)") {
    for (s <- Seq("fo:o", "Bar-·⁀ͯ", "øͰͽBAZ", "fnord42")) assert(isName(s), s)
    for (s <- Seq("-foo", "foo bar", "5BAZ", "")) assert(!isName(s), s)
  }

  test("xs:NCName (reference oracles + non-ASCII regression)") {
    for (s <- Seq("foo", "Bar", "BAZ", "fnord42")) assert(isNcName(s), s)
    for (s <- Seq(":foo", "foo bar", "5BAZ", "", "fo:o")) assert(!isNcName(s), s)
    // the ASCII-only regex wrongly rejected legal non-ASCII NCNames
    for (s <- Seq("Überweisung", "événement", "変数", "αβγ", "Ω_x"))
      assert(isNcName(s), s)
    // and must still reject names starting with digits/combining marks
    for (s <- Seq("۹foo", "ੰx", "·x")) assert(!isNcName(s), s)
  }

  test("xs:anyURI (reference oracles)") {
    for (s <- Seq(
        "https://john.doe@www.example.com:123/forum/questions/?tag=net&order=newest#top",
        "ldap://[2001:db8::7]/c=GB?objectClass?one",
        "mailto:John.Doe@example.com",
        "tel:+1-816-555-1212",
        "http://www.xes-standard.org/concept.xesext"))
      assert(isAnyUri(s), s)
    for (s <- Seq(" ", "foo bar", "5BAZ", "")) assert(!isAnyUri(s), s)
  }

  test("validator accepts a legal non-ASCII classifier name and repairs only real violations") {
    import XesModel._
    val meta = XesMeta(file = "t.xes", xmlAttrs = Map.empty,
      extensions = Nil, globals = Nil,
      classifiers = Seq(
        ClassifierDecl("Überweisung", "event", "concept:name"),
        ClassifierDecl("has space", "event", "concept:name")),
      attrs = Nil)
    val log = ParsedLog(meta, Nil, Nil)
    val violations = XesValidator.validate(log)
      .filter(_.contains("xs:NCName"))
    assert(violations.size == 1 && violations.head.contains("has space"))
    val repaired = XesValidator.repair(log)
    assert(repaired.meta.classifiers.map(_.name) ==
      Seq("Überweisung", "hasspace"))
  }
}
