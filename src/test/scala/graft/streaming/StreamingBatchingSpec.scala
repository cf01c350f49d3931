package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Online batching detection: batch parity with the window kernel,
  * incremental emission (a closed run surfaces before the key goes
  * quiet), and the parked-counter contract (batch ids stay per-key
  * monotone across a gap-timeout flush). */
class StreamingBatchingSpec extends SparkSpec {

  import spark.implicits._

  private def sec(s: Long): Long = s * 1000000L

  test("closed runs emit incrementally and match the batch window kernel") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingBatching.BItem]
    val items = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingBatching.BItem]
    // gapUs 30 s: (100,110) is one run, 200 opens the next
    val q = StreamingBatching.batches(spark, items,
        gapUs = 30L * 1000000L, gapSeconds = 3600L)
      .writeStream.format("memory").queryName("batching_tw")
      .outputMode(OutputMode.Append()).start()
    try {
      def add(evs: StreamingBatching.BItem*): Unit = {
        input.addData(evs: _*); q.processAllAvailable()
      }
      add(StreamingBatching.BItem("A", 1L, sec(100)),
        StreamingBatching.BItem("A", 1L, sec(110)),
        StreamingBatching.BItem("W", 9L, sec(150)))  // wm -> 140
      add(StreamingBatching.BItem("A", 1L, sec(200)),
        StreamingBatching.BItem("W", 9L, sec(260))) // wm -> 250
      // the (100,110) run is final once 200 folds (wm 250 covers it):
      // emitted NOW, while the key is still live (gap timer far away)
      add(StreamingBatching.BItem("A", 1L, sec(300)))
      val early = spark.table("batching_tw")
        .as[StreamingBatching.BatchRow].collect()
      assert(early.exists(b => b.activity == "A" && b.batchId == 1L &&
        b.batchSize == 2L && b.tStartUs == sec(100) && b.tEndUs == sec(110)),
        s"first run not emitted before key close: ${early.toSeq}")
      // flush: timers fire against the advanced watermark
      add(StreamingBatching.BItem("F", -1L, sec(7200)))
      add(StreamingBatching.BItem("F2", -2L, sec(14400)))

      val streamed = spark.table("batching_tw")
        .as[StreamingBatching.BatchRow].collect()
        .filter(b => b.resource >= 0L)
        .map(b => (b.activity, b.resource, b.batchId, b.batchSize,
          b.tStartUs, b.tEndUs)).toSet
      // ground truth: the batch window kernel over the same events
      val df = Seq(("A", 1L, sec(100), 1L), ("A", 1L, sec(110), 2L),
          ("A", 1L, sec(200), 3L), ("A", 1L, sec(300), 6L),
          ("W", 9L, sec(150), 4L), ("W", 9L, sec(260), 5L))
        .toDF("activity", "resource", "us", "event_id")
        .withColumn("ts", timestamp_micros(col("us")))
      val batch = graft.ops.Batching.batches(df, "activity", "resource",
          "ts", "event_id", gapUs = 30L * 1000000L)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
    spark.catalog.dropTempView("batching_tw")
  }

  test("parked counter: batch ids stay monotone across a gap-timeout flush") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingBatching.BItem]
    val items = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingBatching.BItem]
    val q = StreamingBatching.batches(spark, items,
        gapUs = 30L * 1000000L, gapSeconds = 60L)
      .writeStream.format("memory").queryName("batching_park")
      .outputMode(OutputMode.Append()).start()
    try {
      def add(evs: StreamingBatching.BItem*): Unit = {
        input.addData(evs: _*); q.processAllAvailable()
      }
      add(StreamingBatching.BItem("A", 1L, sec(100)))
      // fire A's 60 s gap timer: batch 1 flushes, the key PARKS
      add(StreamingBatching.BItem("F", -1L, sec(1000)))
      add(StreamingBatching.BItem("F2", -2L, sec(2000)))
      val afterFirst = spark.table("batching_park")
        .as[StreamingBatching.BatchRow].collect().filter(_.resource >= 0L)
      assert(afterFirst.map(_.batchId).toSeq == Seq(1L), afterFirst.toSeq)
      // the key RESUMES long after its flush — the parked counter must
      // continue the id sequence, not restart at 1
      add(StreamingBatching.BItem("A", 1L, sec(3000)))
      add(StreamingBatching.BItem("F3", -3L, sec(7200)))
      add(StreamingBatching.BItem("F4", -4L, sec(14400)))
      val all = spark.table("batching_park")
        .as[StreamingBatching.BatchRow].collect().filter(_.resource >= 0L)
      assert(all.map(_.batchId).sorted.toSeq == Seq(1L, 2L),
        s"ids not monotone across the park: ${all.toSeq}")
    } finally q.stop()
    spark.catalog.dropTempView("batching_park")
  }
}
