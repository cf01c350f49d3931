package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Decision-point mining against a hand-computed two-branch split. */
class DecisionSpec extends SparkSpec {

  import spark.implicits._

  // After activity s: branch to x when k is small (10, 20), to y when
  // k is large (90). One case goes s->x->s->y to give s two outgoing
  // decisions in one case.
  private def log = Seq(
    (1L, "s", 0L, 1L, 10L), (1L, "x", 1L, 2L, 0L),
    (2L, "s", 0L, 3L, 20L), (2L, "x", 1L, 4L, 0L),
    (3L, "s", 0L, 5L, 90L), (3L, "y", 1L, 6L, 0L)
  ).map { case (c, act, sec, id, k) =>
    (c, act, new Timestamp(sec * 1000L), id, k)
  }.toDF("case_id", "activity", "ts", "event_id", "k")

  test("branchProfiles: probabilities, gini, exact attribute signature") {
    val out = Decision.branchProfiles(log, "case_id", "activity",
      "ts", "event_id", col("k"))
      .as[(String, String, Long, Double, Double, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap

    // s has branches x (n=2) and y (n=1): p = 2/3, 1/3;
    // gini(s) = 1 − (4+1)/9 = 4/9.
    val sx = out(("s", "x"))
    assert(sx._3 == 2L && sx._4 == 2.0 / 3 && sx._5 == 1.0 - 5.0 / 9)
    assert((sx._6, sx._7, sx._8, sx._9) == ((30L, 2L, 10L, 20L)))
    val sy = out(("s", "y"))
    assert(sy._3 == 1L && sy._4 == 1.0 / 3 && sy._5 == 1.0 - 5.0 / 9)
    assert((sy._6, sy._7, sy._8, sy._9) == ((90L, 1L, 90L, 90L)))
    assert(out.size == 2)
  }

  test("single-branch activities have gini 0") {
    val one = Seq(
      (1L, "a", 0L, 1L, 5L), (1L, "b", 1L, 2L, 5L),
      (2L, "a", 0L, 3L, 7L), (2L, "b", 1L, 4L, 7L)
    ).map { case (c, act, sec, id, k) =>
      (c, act, new Timestamp(sec * 1000L), id, k)
    }.toDF("case_id", "activity", "ts", "event_id", "k")
    val out = Decision.branchProfiles(one, "case_id", "activity",
      "ts", "event_id", col("k"))
      .as[(String, String, Long, Double, Double, Long, Long, Long, Long)]
      .collect()
    assert(out.length == 1)
    assert(out.head._4 == 1.0 && out.head._5 == 0.0)
  }
}
