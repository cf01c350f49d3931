package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental DFG ≡ monolithic recompute, over hand splits and
  * randomized multi-batch folds. */
class IncrementalDfgSpec extends SparkSpec {

  import spark.implicits._

  private def mkLog(rows: Seq[(Long, String, Long, Long)]): DataFrame =
    rows.map { case (c, a, sec, id) =>
      (c, a, new Timestamp(sec * 1000L), id)
    }.toDF("case_id", "activity", "ts", "event_id")

  private def edgeMap(df: DataFrame): Map[(String, String), Long] =
    df.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("two batches with boundary pairs equal the monolithic DFG") {
    val all = Seq(
      (1L, "a", 0L, 1L), (1L, "b", 10L, 2L), (1L, "c", 20L, 3L),
      (2L, "a", 5L, 4L), (2L, "b", 25L, 5L),
      (3L, "x", 30L, 6L))
    // split by time at t=15: case 1 straddles (a b | c), case 2
    // straddles (a | b), case 3 entirely in batch 2.
    val (b1, b2) = all.partition(_._3 < 15L)
    val s0 = IncrementalDfg.init(mkLog(all), "case_id", "activity", "ts", "event_id")
    val s1 = IncrementalDfg.update(s0, mkLog(b1), "case_id", "activity", "ts", "event_id")
    val s2 = IncrementalDfg.update(s1, mkLog(b2), "case_id", "activity", "ts", "event_id")
    val full = Dfg.edges(mkLog(all), "case_id", "activity", "ts", "event_id")
    assert(edgeMap(s2.edges) == edgeMap(full))
    assert(edgeMap(s2.edges) == Map(
      ("a", "b") -> 2L, ("b", "c") -> 1L))
  }

  test("randomized multi-batch folds match the monolithic DFG exactly") {
    val rnd = new scala.util.Random(11)
    val all = (0 until 400).map { i =>
      ((rnd.nextInt(20) + 1).toLong,
        "abcde".charAt(rnd.nextInt(5)).toString, i.toLong, i.toLong + 1)
    }
    // three time-ordered batches at random cut points
    val cuts = Seq(130, 260).map(_.toLong)
    val batches = Seq(
      all.filter(_._3 < cuts(0)),
      all.filter(e => e._3 >= cuts(0) && e._3 < cuts(1)),
      all.filter(_._3 >= cuts(1)))
    var st = IncrementalDfg.init(mkLog(all), "case_id", "activity", "ts", "event_id")
    batches.foreach { b =>
      st = IncrementalDfg.update(st, mkLog(b), "case_id", "activity", "ts", "event_id")
    }
    val full = Dfg.edges(mkLog(all), "case_id", "activity", "ts", "event_id")
    assert(edgeMap(st.edges) == edgeMap(full))
    // frontier holds exactly the open cases with their true last event
    val frontier = st.frontier.as[(Long, String, Timestamp, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val expectedLast = all.groupBy(_._1).view
      .mapValues(_.maxBy(e => (e._3, e._4))._2).toMap
    assert(frontier == expectedLast)
  }

  test("empty-state first fold equals the plain batch DFG") {
    val b = Seq((7L, "a", 0L, 1L), (7L, "b", 1L, 2L))
    val s0 = IncrementalDfg.init(mkLog(b), "case_id", "activity", "ts", "event_id")
    val s1 = IncrementalDfg.update(s0, mkLog(b), "case_id", "activity", "ts", "event_id")
    assert(edgeMap(s1.edges) == Map(("a", "b") -> 1L))
  }
}
