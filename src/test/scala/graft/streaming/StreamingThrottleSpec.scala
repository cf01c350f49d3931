package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming windowed dedup (throttle): lag-relative keep/drop with
  * one-timestamp-per-key state, micro-batch boundaries carrying the
  * state across batches. */
class StreamingThrottleSpec extends SparkSpec {

  import spark.implicits._

  // offset from epoch 0: Spark's INITIAL event-time watermark is 0 ms,
  // and append-mode stateful queries filter rows at-or-before the
  // watermark — an epoch-0 test event would be dropped as late
  private def sec(s: Long): Long = (1000000L + s) * 1000000L

  private def run(batches: Seq[Seq[StreamingThrottle.InEvent]]): Map[String, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingThrottle.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingThrottle.InEvent]
    val q = StreamingThrottle.keptCounts(spark, events, gapSeconds = 10L)
      .writeStream.format("memory").queryName("throttle")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table("throttle")
      .groupBy("label").agg(sum("nTotal").as("t"), sum("nKept").as("k"))
      .as[(String, Long, Long)].collect()
      .map { case (l, t, k) => l -> (t, k) }.toMap
    spark.catalog.dropTempView("throttle")
    out
  }

  test("in-batch: unordered arrival sorted; lag-relative drops chain") {
    // key (1,c) at t=0,5,9,25: 0 kept, 5 dropped, 9 dropped (gap 4
    // from PREVIOUS event, not last kept), 25 kept
    val r = run(Seq(Seq(
      StreamingThrottle.InEvent(1L, "c", sec(9), 3L),
      StreamingThrottle.InEvent(1L, "c", sec(0), 1L),
      StreamingThrottle.InEvent(1L, "c", sec(25), 4L),
      StreamingThrottle.InEvent(1L, "c", sec(5), 2L),
      StreamingThrottle.InEvent(1L, "v", sec(6), 5L),
      StreamingThrottle.InEvent(2L, "c", sec(1), 6L))))
    assert(r == Map("c" -> (5L, 3L), "v" -> (1L, 1L)))
  }

  test("cross-batch: state carries the last timestamp over the boundary") {
    val b1 = Seq(StreamingThrottle.InEvent(1L, "c", sec(0), 1L))
    // arrives in a LATER micro-batch but within the gap: dropped
    val b2 = Seq(StreamingThrottle.InEvent(1L, "c", sec(8), 2L))
    // beyond the gap from the batch-2 event: kept
    val b3 = Seq(StreamingThrottle.InEvent(1L, "c", sec(30), 3L))
    val r = run(Seq(b1, b2, b3))
    assert(r == Map("c" -> (3L, 2L)))
  }

  test("cross-batch out-of-order row cannot rewind state (no over-keep)") {
    // Outside the per-key-order contract: sec(95) arrives a batch
    // AFTER sec(100) but above the watermark (100-10=90). It must not
    // rewind the stored timestamp — otherwise sec(106) is judged
    // against 95 (gap 11 > 10) and over-kept. The sorted-batch rule on
    // {95,100,106} keeps exactly 1; state max keeps exactly 1 (the
    // first-seen 100) instead of the rewound verdict of 2.
    val r = run(Seq(
      Seq(StreamingThrottle.InEvent(1L, "c", sec(100), 1L)),
      Seq(StreamingThrottle.InEvent(1L, "c", sec(95), 2L),
          StreamingThrottle.InEvent(1L, "c", sec(106), 3L))))
    assert(r == Map("c" -> (3L, 1L)))
  }

  test("eviction: an idle key re-keeps after the gap horizon (same verdict)") {
    // watermark advances far past key 1's last event + gap via key 2's
    // traffic; key 1's state is evicted, and its next event — which is
    // beyond the gap anyway — is kept exactly as the batch lag rule says
    val r = run(Seq(
      Seq(StreamingThrottle.InEvent(1L, "c", sec(0), 1L)),
      Seq(StreamingThrottle.InEvent(2L, "c", sec(1000), 2L)),
      Seq(StreamingThrottle.InEvent(1L, "c", sec(1500), 3L))))
    assert(r == Map("c" -> (3L, 3L)))
  }
}
