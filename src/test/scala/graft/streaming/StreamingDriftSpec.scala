package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming drift: window flushes on watermark, L1 matches the batch
  * operator's hand-computed values. */
class StreamingDriftSpec extends SparkSpec {

  import spark.implicits._

  private def sec(s: Long): Long = s * 1000000L

  test("per-window L1 vs baseline, flushed by event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDrift.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "5 seconds")
      .as[StreamingDrift.InEvent]

    val drifts = StreamingDrift.monitor(spark, events, windowSeconds = 60,
      baseline = Map("a" -> 1L, "b" -> 1L))
    val query = drifts.writeStream
      .format("memory").queryName("window_drift")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [0,60): a a a b  -> mix (3,1) vs baseline (.5,.5):
      //   L1 = |3·2−1·4|/8 + |1·2−1·4|/8 = 0.5
      // window [60,120): a b    -> identical mix, L1 = 0
      input.addData(
        StreamingDrift.InEvent("a", sec(1)),
        StreamingDrift.InEvent("a", sec(2)),
        StreamingDrift.InEvent("a", sec(3)),
        StreamingDrift.InEvent("b", sec(4)),
        StreamingDrift.InEvent("a", sec(61)),
        StreamingDrift.InEvent("b", sec(62)))
      query.processAllAvailable()
      // advance the watermark far past both window ends
      input.addData(StreamingDrift.InEvent("z", sec(400)))
      query.processAllAvailable()
      input.addData(StreamingDrift.InEvent("z", sec(401)))
      query.processAllAvailable()

      val out = spark.table("window_drift")
        .as[StreamingDrift.WindowDrift].collect()
        .map(w => w.windowStartMicros -> ((w.nEvents, w.l1x2VsBaseline)))
        .toMap
      assert(out(sec(0)) == ((4L, 0.5)))
      assert(out(sec(60)) == ((2L, 0.0)))
      assert(!out.contains(sec(360))) // the z window is still open
    } finally query.stop()
  }

  test("unseen activities count their full baseline-relative mass") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDrift.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "5 seconds")
      .as[StreamingDrift.InEvent]
    // window of only x (not in baseline): |1·2−0·1|/2 + |0−1·1|/2 + |0−1·1|/2 = 2
    val drifts = StreamingDrift.monitor(spark, events, windowSeconds = 60,
      baseline = Map("a" -> 1L, "b" -> 1L))
    val query = drifts.writeStream
      .format("memory").queryName("window_drift2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamingDrift.InEvent("x", sec(1)))
      query.processAllAvailable()
      input.addData(StreamingDrift.InEvent("z", sec(400)))
      query.processAllAvailable()
      input.addData(StreamingDrift.InEvent("z", sec(401)))
      query.processAllAvailable()
      val out = spark.table("window_drift2")
        .as[StreamingDrift.WindowDrift].collect()
      assert(out.exists(w => w.windowStartMicros == sec(0) &&
        w.nEvents == 1L && w.l1x2VsBaseline == 2.0))
    } finally query.stop()
  }
}
