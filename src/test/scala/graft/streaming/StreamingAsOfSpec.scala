package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streaming as-of must emit exactly the batch ASOF LEFT JOIN's
  * rows under genuine multi-batch watermark advance — including a
  * purchase answered by a click the state already COMPACTED (the
  * bounded-state mechanism), the click-at-purchase-ts tie (≤, not <),
  * and the no-preceding-click None. */
class StreamingAsOfSpec extends SparkSpec {

  import spark.implicits._

  private def sec(s: Long): Long = s * 1000000L

  test("multi-batch: eviction, compacted click, tie, and None all exact") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val items = input.toDS()
      .toDF("userId", "kind", "eventId", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingAsOf.AItem]
    val q = StreamingAsOf.backward(spark, items, gapSeconds = 3600L)
      .writeStream.format("memory").queryName("asof_tw")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 100's purchase at t=5 PRECEDES its click at
      // t=10 (must resolve to None); user 300's click will be
      // compacted long before its purchase arrives; user 400's click
      // will be compacted AND its key fully drained before its
      // purchase exists at all
      input.addData(Seq(
        (100L, "click", 901L, sec(10)),
        (100L, "purchase", 5L, sec(5)),
        (300L, "click", 902L, sec(10)),
        (400L, "click", 904L, sec(10))))
      q.processAllAvailable()
      // batch 2: watermark is now 0 s; purchase t=12 lands with its
      // answering click already in state, click t=30 advances time
      input.addData(Seq(
        (100L, "purchase", 12L, sec(12)),
        (100L, "click", 903L, sec(30))))
      q.processAllAvailable()
      // batch 3: watermark 20 s -> purchases 5 and 12 finalize here;
      // user 300's click t=10 is compacted (10 < 20) with its
      // purchase PENDING; user 400's click t=10 compacts with NOTHING
      // pending; the tie purchase (t=30 == click t=30) arrives
      input.addData(Seq(
        (100L, "purchase", 30L, sec(30)),
        (300L, "purchase", 100L, sec(100)),
        (400L, "click", 905L, sec(30))))
      q.processAllAvailable()
      // sentinels: push the watermark past everything, twice (timers
      // fire against the PRIOR batch's watermark). After these, user
      // 400's key is fully DRAINED — no pending purchase, every click
      // compacted — and must PARK as its one standing long
      input.addData(Seq((-1L, "__sentinel__", -1L, sec(86400))))
      q.processAllAvailable()
      input.addData(Seq((-2L, "__sentinel__", -2L, sec(2 * 86400))))
      q.processAllAvailable()
      // the late-joining purchase: user 400 buys two days after its
      // last click — the parked long must still answer it (the bug
      // the x10 fingerprint caught: draining used to DELETE the key)
      input.addData(Seq((400L, "purchase", 200L, sec(2 * 86400 + 50))))
      q.processAllAvailable()
      input.addData(Seq((-3L, "__sentinel__", -3L, sec(3 * 86400))))
      q.processAllAvailable()
      input.addData(Seq((-4L, "__sentinel__", -4L, sec(4 * 86400))))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "asof_tw")
    val got = spark.table("asof_tw").as[StreamingAsOf.AsOfRow].collect()
      .map(r => r.purchaseId -> r.lastClickTsMicros).toMap
    spark.catalog.dropTempView("asof_tw")
    assert(got == Map(
      5L -> None,            // purchase precedes every click
      12L -> Some(sec(10)),  // plain backward match
      30L -> Some(sec(30)),  // click AT purchase ts counts (<=)
      100L -> Some(sec(10)), // answered by the COMPACTED click
      200L -> Some(sec(30)), // answered by the PARKED key's long
      ))
    assert(got.size == 5) // exactly one row per purchase, none dropped
  }
}
