package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Performance-annotated DFG, frequency simplification, and rework
  * metrics against a hand-computed three-case log. */
class DfgPerfSpec extends SparkSpec {

  import spark.implicits._

  // case 1: a@0s -> b@10s -> a@25s ; case 2: a@0s -> b@5s ;
  // case 3: c@0s -> c@60s
  private def log = Seq(
    (1L, "a", 0L, 1L), (1L, "b", 10L, 2L), (1L, "a", 25L, 3L),
    (2L, "a", 0L, 4L), (2L, "b", 5L, 5L),
    (3L, "c", 0L, 6L), (3L, "c", 60L, 7L)
  ).map { case (c, act, sec, id) =>
    (c, act, new Timestamp(sec * 1000L), id)
  }.toDF("case_id", "activity", "ts", "event_id")

  test("edgePerformance: counts and integer waiting-time stats per edge") {
    val out = Dfg.edgePerformance(log, "case_id", "activity", "ts", "event_id")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(("a", "b")) == ((2L, 15000000L, 5000000L, 10000000L)))
    assert(out(("b", "a")) == ((1L, 15000000L, 15000000L, 15000000L)))
    assert(out(("c", "c")) == ((1L, 60000000L, 60000000L, 60000000L)))
    assert(out.size == 3)
  }

  test("simplify: infrequent activities and edges drop out together") {
    // activity counts: a=3, b=2, c=2; edges: a>b (2), b>a (1), c>c (1)
    val keepAll = Dfg.simplify(log, "case_id", "activity", "ts", "event_id",
      minActivityN = 1L, minEdgeN = 1L)
    assert(keepAll.count() == 3)
    // edge threshold 2 keeps only a>b
    val edges2 = Dfg.simplify(log, "case_id", "activity", "ts", "event_id",
      minActivityN = 1L, minEdgeN = 2L)
      .as[(String, String, Long)].collect().toSeq
    assert(edges2 == Seq(("a", "b", 2L)))
    // activity threshold 3 keeps only {a}: no surviving edge (a>b lost
    // its endpoint even though the edge count passes)
    val acts3 = Dfg.simplify(log, "case_id", "activity", "ts", "event_id",
      minActivityN = 3L, minEdgeN = 1L)
    assert(acts3.count() == 0)
  }

  test("rework: repeat-execution profile per activity") {
    val out = Rework.perActivity(log, "case_id", "activity")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // a: cases {1,2}, repeats in case 1 (k=2)
    assert(out("a") == ((2L, 1L, 1L, 2L)))
    // b: cases {1,2}, never repeats
    assert(out("b") == ((2L, 0L, 0L, 1L)))
    // c: case {3} only, k=2
    assert(out("c") == ((1L, 1L, 1L, 2L)))
  }

  test("workingTogether generalized: same-case label co-occurrence") {
    val out = graft.dsl.Org.workingTogether(log, "case_id", "activity")
      .as[(String, String, Long)].collect().toSeq.sorted
    // {a,b} share cases 1 and 2; c shares with nothing
    assert(out == Seq(("a", "b", 2L)))
  }
}
