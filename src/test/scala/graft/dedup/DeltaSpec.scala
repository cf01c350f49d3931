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

  /** Sequential reference with the same status semantics. */
  private def naive(old: Seq[(Long, String)], neu: Seq[(Long, String)])
      : Set[(Long, String, Option[Long])] = {
    val om = old.toMap; val nm = neu.toMap
    val changed = (om.keySet & nm.keySet)
      .filter(id => om(id) != nm(id))
      .map(id => (id, "changed", Option.empty[Long]))
    val remIds = om.keySet -- nm.keySet
    val addIds = nm.keySet -- om.keySet
    val remByText = remIds.groupBy(om).map { case (t, ids) => t -> ids.min }
    val addByText = addIds.groupBy(nm).map { case (t, ids) => t -> ids.min }
    val removed = remIds.map { id =>
      addByText.get(om(id)) match {
        case Some(to) => (id, "moved", Some(to))
        case None => (id, "removed", Option.empty[Long])
      }
    }
    val added = addIds.map { id =>
      remByText.get(nm(id)) match {
        case Some(to) => (id, "moved", Some(to))
        case None => (id, "added", Option.empty[Long])
      }
    }
    changed ++ removed ++ added
  }

  test("random snapshot pairs == sequential reference (20 rounds)") {
    val rnd = new scala.util.Random(20260818L)
    (1 to 20).foreach { round =>
      // small id and content spaces force id reuse, content moves,
      // duplicated content, and edits
      def snap() = (1L to (3 + rnd.nextInt(8)).toLong)
        .filter(_ => rnd.nextBoolean())
        .map(i => i -> s"content-${rnd.nextInt(5)}")
      val old = snap(); val neu = snap()
      assert(run(old, neu) == naive(old, neu),
        s"round $round old=$old new=$neu")
    }
  }
}
