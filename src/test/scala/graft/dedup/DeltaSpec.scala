package graft.dedup

import graft.SparkSpec

/** Snapshot diff semantics on hand-built snapshots: every status,
  * move matching by content, and unchanged rows omitted. */
class DeltaSpec extends SparkSpec {

  import spark.implicits._

  private def run(old: Seq[(Long, String)], neu: Seq[(Long, String)]) =
    Delta.corpusDelta(old.toDF("doc_id", "text"), neu.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet

  test("added / removed / changed / unchanged") {
    val old = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    val neu = Seq(1L -> "alpha", 2L -> "beta EDITED", 4L -> "delta")
    assert(run(old, neu) == Set(
      (2L, "changed", None),
      (3L, "removed", None),
      (4L, "added", None)))
  }

  test("rename surfaces as moved on both sides, pointing at each other") {
    val old = Seq(1L -> "stable", 5L -> "wandering content")
    val neu = Seq(1L -> "stable", 9L -> "wandering content")
    assert(run(old, neu) == Set(
      (5L, "moved", Some(9L)),
      (9L, "moved", Some(5L))))
  }

  test("move matching only within the added/removed remainder, ties to min id") {
    // content 'x' removed at 5 and 6, re-added at 8 and 9: every side
    // matches the other side's MIN id
    val old = Seq(5L -> "x", 6L -> "x", 7L -> "keep")
    val neu = Seq(7L -> "keep", 8L -> "x", 9L -> "x")
    assert(run(old, neu) == Set(
      (5L, "moved", Some(8L)), (6L, "moved", Some(8L)),
      (8L, "moved", Some(5L)), (9L, "moved", Some(5L))))
    // content still present under an UNCHANGED id does not make a
    // removed copy 'moved' (the unchanged row is not in the remainder)
    val old2 = Seq(1L -> "y", 2L -> "y")
    val neu2 = Seq(1L -> "y")
    assert(run(old2, neu2) == Set((2L, "removed", None)))
  }

  test("whitespace and case edits are changes (no normalization)") {
    val old = Seq(1L -> "Same Text")
    val neu = Seq(1L -> "same text ")
    assert(run(old, neu) == Set((1L, "changed", None)))
  }

  test("identical snapshots produce an empty delta") {
    val s = Seq(1L -> "a", 2L -> "b")
    assert(run(s, s).isEmpty)
  }
}
