package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** FIFO start/complete pairing with overlapping instances, a
  * complete-only event, and an open start.
  */
class LifecycleSpec extends SparkSpec {

  import spark.implicits._

  // case 1, activity a: start@0, start@5, complete@10, complete@30
  //   → FIFO instances (0→10), (5→30)
  // case 1, activity b: complete@40 (complete-only)
  // case 2, activity a: start@0 (open, never completes)
  private def log = Seq(
    (1L, "a", "start", 0L, 1L), (1L, "a", "start", 5L, 2L),
    (1L, "a", "complete", 10L, 3L), (1L, "a", "complete", 30L, 4L),
    (1L, "b", "complete", 40L, 5L),
    (2L, "a", "start", 0L, 6L)
  ).map { case (c, act, lc, sec, id) =>
    (c, act, lc, new Timestamp(sec * 1000L), id)
  }.toDF("case_id", "activity", "lifecycle", "ts", "event_id")

  test("activityInstances: FIFO pairing, complete-only sentinel") {
    val out = Lifecycle.activityInstances(log, "case_id", "activity",
      "lifecycle", "ts", "event_id")
      .as[(Long, String, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    assert(out == Map(
      (1L, "a", 1) -> ((0L, 10000000L, 10000000L)),
      (1L, "a", 2) -> ((5000000L, 30000000L, 25000000L)),
      (1L, "b", 1) -> ((40000000L, 40000000L, -1L))))
  }

  test("openInstances: the start with no FIFO complete") {
    val open = Lifecycle.openInstances(log, "case_id", "activity",
      "lifecycle", "ts", "event_id")
      .as[(Long, String, Int, Long)].collect()
    assert(open.toSeq == Seq((2L, "a", 1, 0L)))
  }

  test("serviceTimes: matched instances only") {
    val st = Lifecycle.serviceTimes(log, "case_id", "activity",
      "lifecycle", "ts", "event_id")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(st.toSeq == Seq(("a", 2L, 35000000L, 10000000L, 25000000L)))
  }
}
