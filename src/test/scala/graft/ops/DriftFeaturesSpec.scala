package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Hand-computed drift scores and prefix-feature rows. */
class DriftFeaturesSpec extends SparkSpec {

  import spark.implicits._

  // Two ISO weeks: 2024-01-01 and 2024-01-08 are both Mondays.
  private def wk(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("activityDrift: L1 against the global mix, exact fractions") {
    // week 1: a,a,a,b (N=4) ; week 2: a,b,b,b (N=4); global a:4 b:4 G=8
    // L1 = |3·8−4·4|/32 + |1·8−4·4|/32 = 0.5 for both weeks.
    val ev = Seq(
      ("a", wk(1, 1)), ("a", wk(2, 1)), ("a", wk(3, 1)), ("b", wk(4, 1)),
      ("a", wk(8, 1)), ("b", wk(9, 1)), ("b", wk(10, 1)), ("b", wk(11, 1))
    ).toDF("activity", "ts")
    val out = Drift.activityDrift(ev, "activity", "ts", "week")
      .as[(Timestamp, Long, Double)].collect()
      .map(r => r._1.toString.take(10) -> ((r._2, r._3))).toMap
    assert(out == Map(
      "2024-01-01" -> ((4L, 0.5)),
      "2024-01-08" -> ((4L, 0.5))))
  }

  test("activityDrift: identical mixes score exactly zero") {
    val ev = Seq(
      ("a", wk(1, 1)), ("b", wk(2, 1)),
      ("a", wk(8, 1)), ("b", wk(9, 1))
    ).toDF("activity", "ts")
    val out = Drift.activityDrift(ev, "activity", "ts", "week")
      .as[(Timestamp, Long, Double)].collect()
    assert(out.length == 2 && out.forall(_._3 == 0.0))
  }

  test("activityDrift: activity missing from a period counts its full global mass") {
    // week 1: only a; week 2: only b. Each period is (1,0) vs global
    // (0.5,0.5): L1 = |1−.5| + |0−.5| = 1 — the supremum for a period
    // holding half the global mass.
    val ev = Seq(("a", wk(1, 1)), ("b", wk(8, 1))).toDF("activity", "ts")
    val out = Drift.activityDrift(ev, "activity", "ts", "week")
      .as[(Timestamp, Long, Double)].collect()
    assert(out.forall(_._3 == 1.0))
  }

  test("prefixFeatures: every feature and label of a three-event case") {
    val ev = Seq(
      (1L, "a", new Timestamp(0L), 1L),
      (1L, "b", new Timestamp(10000L), 2L),
      (1L, "a", new Timestamp(25000L), 3L)
    ).toDF("case_id", "activity", "ts", "event_id")
    val out = Features.prefixFeatures(ev, "case_id", "activity", "ts", "event_id")
      .as[(Long, Int, String, Long, Long, Long, Long, Long, String)]
      .collect().sortBy(_._2)
    assert(out(0) == ((1L, 1, "a", 0L, -1L, 0L, 25000000L, 2L, "b")))
    assert(out(1) == ((1L, 2, "b", 10000000L, 10000000L, 0L, 15000000L, 1L, "a")))
    assert(out(2) == ((1L, 3, "a", 25000000L, 15000000L, 1L, 0L, 0L, "")))
  }
}
