package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The silent-undercount precondition (StreamingThrottle.scala:16-26)
  * made loud: rows at-or-below the watermark are discarded BEFORE any
  * stateful handler sees them, and without observability a lossy run
  * is indistinguishable from a clean one. LateDrops folds Spark's
  * numRowsDroppedByWatermark counter; these specs pin both directions
  * — zero on a watermark-compatible feed, nonzero (and assertNone
  * throwing) on a cross-batch skew beyond the delay.
  */
class LateDropsSpec extends SparkSpec {

  import spark.implicits._

  private def sec(s: Long): Long = (1000000L + s) * 1000000L

  /** Runs the throttle operator over `batches`; returns (query drops,
    * emitted nTotal sum) so tests can see what the operator counted. */
  private def run(batches: Seq[Seq[StreamingThrottle.InEvent]]): (Long, Long) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingThrottle.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingThrottle.InEvent]
    val q = StreamingThrottle.keptCounts(spark, events, gapSeconds = 10L)
      .writeStream.format("memory").queryName("latedrops")
      .outputMode(OutputMode.Append()).start()
    val drops = try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      LateDrops.count(q)
    } finally q.stop()
    val total = spark.table("latedrops")
      .agg(coalesce(sum("nTotal"), lit(0L))).as[Long].head()
    spark.catalog.dropTempView("latedrops")
    (drops, total)
  }

  test("watermark-compatible feed: zero drops, assertNone passes") {
    val (drops, total) = run(Seq(
      Seq(StreamingThrottle.InEvent(1L, "c", sec(0), 1L)),
      Seq(StreamingThrottle.InEvent(1L, "c", sec(20), 2L))))
    assert(drops == 0L)
    assert(total == 2L)
  }

  test("cross-key skew beyond the delay: the drop is counted, not silent") {
    // key 2's traffic advances the watermark to sec(990); key 1's
    // sec(50) row in the next batch is 940 s late — discarded before
    // the handler, so the operator tallies only 2 of 3 input rows.
    // Without LateDrops this run is indistinguishable from a clean
    // one; with it, the loss is measured and assertNone fails loudly.
    val (drops, total) = run(Seq(
      Seq(StreamingThrottle.InEvent(2L, "c", sec(1000), 1L)),
      Seq(StreamingThrottle.InEvent(1L, "c", sec(50), 2L),
          StreamingThrottle.InEvent(2L, "c", sec(1050), 3L))))
    assert(drops == 1L, s"expected the skewed row counted as dropped, got $drops")
    assert(total == 2L, "the dropped row must not reach the handler")
  }

  test("assertNone throws with the undercount message on a lossy run") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingThrottle.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingThrottle.InEvent]
    val q = StreamingThrottle.keptCounts(spark, events, gapSeconds = 10L)
      .writeStream.format("memory").queryName("latedrops_throw")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(StreamingThrottle.InEvent(2L, "c", sec(1000), 1L)))
      q.processAllAvailable()
      input.addData(Seq(StreamingThrottle.InEvent(1L, "c", sec(50), 2L)))
      q.processAllAvailable()
      val e = intercept[IllegalArgumentException] {
        LateDrops.assertNone(q, "lossy_probe")
      }
      assert(e.getMessage.contains("silently undercounts"))
    } finally q.stop()
    spark.catalog.dropTempView("latedrops_throw")
  }
}
