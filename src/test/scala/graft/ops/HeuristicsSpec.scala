package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Heuristics-miner causal net against a hand-computed log.
  *
  * case 1: a b a b c ; case 2: a c ; case 3: d d c
  *
  * DFG counts: ab:2 ba:1 bc:1 ac:1 dd:1 dc:1.
  * Dependencies: ab = (2−1)/4 = 0.25, ba = −0.25, bc = ac = dc = 0.5,
  * dd = 1/2 (self-loop form). L2 windows in case 1: `a b a` and
  * `b a b` → l2(a,b) = l2(b,a) = 2/3.
  */
class HeuristicsSpec extends SparkSpec {

  import spark.implicits._

  private def log = Seq(
    (1L, "a", 0L, 1L), (1L, "b", 1L, 2L), (1L, "a", 2L, 3L),
    (1L, "b", 3L, 4L), (1L, "c", 4L, 5L),
    (2L, "a", 0L, 6L), (2L, "c", 1L, 7L),
    (3L, "d", 0L, 8L), (3L, "d", 1L, 9L), (3L, "c", 2L, 10L)
  ).map { case (c, act, sec, id) =>
    (c, act, new Timestamp(sec * 1000L), id)
  }.toDF("case_id", "activity", "ts", "event_id")

  test("l2Counts: overlapping aba windows, both orientations") {
    val l2 = Heuristics.l2Counts(log, "case_id", "activity", "ts", "event_id")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(l2 == Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }

  test("net at high threshold: L2 loops + all-tasks-connected only") {
    val out = Heuristics.net(log, "case_id", "activity", "ts", "event_id",
      depThreshold = 0.6, minEdgeN = 1L)
      .as[(String, String, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // No dependency reaches 0.6; ab/ba kept by l2 (2/3); the best-of
    // heuristic connects every activity. dd (dep .5) is dropped.
    assert(out == Map(
      ("a", "b") -> "l2", ("b", "a") -> "l2",
      ("a", "c") -> "best", ("b", "c") -> "best", ("d", "c") -> "best"))
  }

  test("net at low threshold: dep fires first, self-loop kept") {
    val out = Heuristics.net(log, "case_id", "activity", "ts", "event_id",
      depThreshold = 0.4, minEdgeN = 1L)
      .as[(String, String, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(out == Map(
      ("a", "b") -> "l2", ("b", "a") -> "l2",
      ("a", "c") -> "dep", ("b", "c") -> "dep",
      ("d", "c") -> "dep", ("d", "d") -> "dep"))
  }

  test("frequency gate: minEdgeN suppresses the dep rule, best still connects") {
    val out = Heuristics.net(log, "case_id", "activity", "ts", "event_id",
      depThreshold = 0.4, minEdgeN = 2L)
      .as[(String, String, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // All dep-kept edges have n = 1 < 2 → only l2 + best survive.
    assert(out == Map(
      ("a", "b") -> "l2", ("b", "a") -> "l2",
      ("a", "c") -> "best", ("b", "c") -> "best", ("d", "c") -> "best"))
  }
}
