package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batching-behavior detection vs brute-force run segmentation. */
class BatchingSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Long, Long)]) =
    rows.toDF("act", "res", "t", "id")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L))

  // (act, res, tSeconds, id) with a gap threshold in seconds
  private def bruteBatches(rows: Seq[(String, Long, Long, Long)], gapS: Long) =
    rows.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((a, r), es) =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._3)
      val sizes = scala.collection.mutable.ListBuffer.empty[Long]
      var last = Long.MinValue / 2
      sorted.foreach { t =>
        if (sizes.isEmpty || t - last > gapS) sizes += 1L
        else sizes(sizes.length - 1) += 1L
        last = t
      }
      sizes.toSeq.map(sz => (a, r, sz))
    }

  val rows = Seq(
    // resource 1 batches activity "scan": runs of 3, then (gap 100) 2
    ("scan", 1L, 0L, 1L), ("scan", 1L, 5L, 2L), ("scan", 1L, 10L, 3L),
    ("scan", 1L, 110L, 4L), ("scan", 1L, 115L, 5L),
    // resource 2 does scans singly (all gaps > 30)
    ("scan", 2L, 0L, 6L), ("scan", 2L, 50L, 7L), ("scan", 2L, 100L, 8L),
    // pack: one run of 2 with a boundary-exact gap of 30 (<= keeps it)
    ("pack", 1L, 0L, 9L), ("pack", 1L, 30L, 10L))

  test("batches: maximal runs with inclusive gap boundary") {
    val got = Batching
      .batches(ev(rows), "act", "res", "ts", "id", gapUs = 30L * 1000000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val sizes = got.map(b => (b._1, b._2, b._4)).sorted.toSeq
    assert(sizes == bruteBatches(rows, 30L).sorted)
    // batch extents are the run's min/max ts
    val scanR1 = got.filter(b => b._1 == "scan" && b._2 == 1L)
      .map(b => (b._4, b._5, b._6)).sortBy(_._2).toSeq
    assert(scanR1 == Seq((3L, 0L, 10L * 1000000L),
      (2L, 110L * 1000000L, 115L * 1000000L)))
  }

  test("summary: per-activity batch counts and batched-event mass") {
    val got = Batching
      .summary(ev(rows), "act", "res", "ts", "id", gapUs = 30L * 1000000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // scan: r1 has runs {3,2}, r2 has {1,1,1} -> 5 batches, max 3,
    // batched events 3+2=5
    assert(got("scan") == ((5L, 3L, 5L)))
    // pack: one run of 2 -> batched events 2
    assert(got("pack") == ((1L, 2L, 2L)))
  }

  test("ties on ts order deterministically via the tie-break column") {
    val tied = Seq(("a", 1L, 10L, 2L), ("a", 1L, 10L, 1L), ("a", 1L, 10L, 3L))
    val got = Batching
      .batches(ev(tied), "act", "res", "ts", "id", gapUs = 0L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1 && got.head._4 == 3L) // zero gaps: one batch
  }
}
