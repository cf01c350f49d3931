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

  test("forward: horizon match, horizon cut, evicted-click fold, equal-ts tie, drained key removed") {
    implicit val sqlCtx = spark.sqlContext
    val H = 100L // seconds
    val input = MemoryStream[(Long, String, Long, Long)]
    val items = input.toDS()
      .toDF("userId", "kind", "eventId", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingAsOf.AItem]
    val q = StreamingAsOf.forward(spark, items, horizonSeconds = H,
        gapSeconds = 3600L)
      .writeStream.format("memory").queryName("asof_fw")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: purchase t=5 will be answered by click t=50 (inside
      // [5,105]); the click arrives in the SAME batch. purchase t=200
      // waits. user 2's purchase t=10 has its click at t=10 (tie).
      input.addData(Seq(
        (1L, "purchase", 1L, sec(5)),
        (1L, "click", 900L, sec(50)),
        (1L, "purchase", 2L, sec(200)),
        (2L, "purchase", 3L, sec(10)),
        (2L, "click", 901L, sec(10))))
      q.processAllAvailable()
      // batch 2: a BETTER (earlier-in-window) click for purchase 2
      // cannot exist below the watermark; click t=210 matches it.
      // click t=260 also matches but is later — best must stay 210.
      // The wm after batch 1 is 190 (200-10): click t=50 is about to
      // be evicted, purchase 1 must already hold it as fwdBest.
      input.addData(Seq(
        (1L, "click", 902L, sec(210)),
        (1L, "click", 903L, sec(260)),
        (1L, "purchase", 4L, sec(400)))) // will be horizon-cut: no click in [400,500]
      q.processAllAvailable()
      // flush: two sentinels past maxTs + H + slack
      input.addData(Seq((-1L, "__sentinel__", -1L, sec(2000))))
      q.processAllAvailable()
      input.addData(Seq((-2L, "__sentinel__", -2L, sec(4000))))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "asof_fw")
    val got = spark.table("asof_fw").as[StreamingAsOf.FwdRow].collect()
      .map(r => r.purchaseId -> r.firstClickTsMicros).toMap
    spark.catalog.dropTempView("asof_fw")
    assert(got == Map(
      1L -> Some(sec(50)),  // in-window match folded before eviction
      2L -> Some(sec(210)), // first (not any) click in window
      3L -> Some(sec(10)),  // click AT purchase ts counts (>=)
      4L -> None,           // no click in [400, 500]: horizon-cut
      ))
    assert(got.size == 4)
  }

  test("nearest: backward freeze survives later compaction; ties backward; both-None") {
    implicit val sqlCtx = spark.sqlContext
    val H = 100L
    val input = MemoryStream[(Long, String, Long, Long)]
    val items = input.toDS()
      .toDF("userId", "kind", "eventId", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingAsOf.AItem]
    val q = StreamingAsOf.nearest(spark, items, horizonSeconds = H,
        gapSeconds = 3600L)
      .writeStream.format("memory").queryName("asof_nw")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 is the freeze torture case: click 100, purchase 150,
      // clicks 200 and 245 — the answer is the TIE between 100 and
      // 200 (both 50 away), resolving backward to 100. Click 200
      // compacts into the standing long BEFORE the purchase finalizes
      // (wm passes 200 while the purchase waits on 150+H=250), so an
      // implementation without the freeze would read the polluted
      // compactMax=200 and answer forward. user 9 only advances the
      // watermark. user 2: purchase with no clicks -> None. user 3:
      // backward click 10 compacted early, forward 390 (90 < 290).
      input.addData(Seq(
        (1L, "click", 900L, sec(100)),
        (3L, "click", 901L, sec(10)),
        (2L, "purchase", 20L, sec(50)),
        (9L, "click", 990L, sec(60))))
      q.processAllAvailable() // wm -> 90
      input.addData(Seq(
        (1L, "purchase", 10L, sec(150)),
        (9L, "click", 991L, sec(180))))
      q.processAllAvailable() // wm -> 170 (purchase 150 arrived at wm 90)
      input.addData(Seq(
        (1L, "click", 902L, sec(200)), // folds as fwdBest, then the settle
                                       // (wm 170 > 150) FREEZES bwd=100 and
                                       // compacts click 100
        (9L, "click", 992L, sec(230))))
      q.processAllAvailable() // wm -> 220
      input.addData(Seq(
        (1L, "click", 903L, sec(245)), // in-window but later than 200: best
                                       // stays 200; settle (wm 220) compacts
                                       // click 200 into compactMax
        (3L, "purchase", 30L, sec(300)),
        (3L, "click", 904L, sec(390)),
        (9L, "click", 993L, sec(300))))
      q.processAllAvailable() // wm -> 290 > 250: purchase 150 finalizes on
                              // its timer only AFTER click 200 compacted
      input.addData(Seq((-1L, "__sentinel__", -1L, sec(2000))))
      q.processAllAvailable()
      input.addData(Seq((-2L, "__sentinel__", -2L, sec(4000))))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "asof_nw")
    val got = spark.table("asof_nw").as[StreamingAsOf.NearRow].collect()
      .map(r => r.purchaseId -> r.nearestClickTsMicros).toMap
    spark.catalog.dropTempView("asof_nw")
    assert(got == Map(
      10L -> Some(sec(100)), // tie (50 vs 50) resolves BACKWARD
      20L -> None,           // no click on either side
      30L -> Some(sec(390)), // forward beats the compacted backward
      ))
    assert(got.size == 3)
  }

  test("nearest: tie click arriving before freeze gives same answer as batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val items = input.toDS()
      .toDF("userId", "kind", "eventId", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingAsOf.AItem]
    val q = StreamingAsOf.nearest(spark, items, horizonSeconds = 100L,
        gapSeconds = 3600L)
      .writeStream.format("memory").queryName("asof_nw2")
      .outputMode(OutputMode.Append()).start()
    try {
      // everything in one batch: purchase t=150 between clicks 100 and
      // 200 (tie -> 100); purchase t=149 (bwd 100 d=49, fwd 200 d=51
      // -> 100); purchase t=151 (bwd 100 d=51, fwd 200 d=49 -> 200)
      input.addData(Seq(
        (1L, "click", 900L, sec(100)),
        (1L, "click", 901L, sec(200)),
        (1L, "purchase", 10L, sec(150)),
        (1L, "purchase", 11L, sec(149)),
        (1L, "purchase", 12L, sec(151))))
      q.processAllAvailable()
      input.addData(Seq((-1L, "__sentinel__", -1L, sec(2000))))
      q.processAllAvailable()
      input.addData(Seq((-2L, "__sentinel__", -2L, sec(4000))))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "asof_nw2")
    val got = spark.table("asof_nw2").as[StreamingAsOf.NearRow].collect()
      .map(r => r.purchaseId -> r.nearestClickTsMicros).toMap
    spark.catalog.dropTempView("asof_nw2")
    assert(got == Map(
      10L -> Some(sec(100)), 11L -> Some(sec(100)), 12L -> Some(sec(200))))
  }

  test("payloads: all three flavors match the batch struct-ordered tie policy") {
    // The AsOfSpec tie dataset, streamed: clicks with (key, ts) TIES
    // carrying distinct payloads (eventId). Expectations are the batch
    // kernel's — backward greatest (ts, pay); forward least among
    // strictly-later but greatest at exactly the purchase ts (the
    // equal-ts recovery); nearest the winning side's payload.
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (1L, "click", 10L, sec(100)), (1L, "click", 20L, sec(100)),
      (1L, "click", 5L, sec(200)), (1L, "click", 7L, sec(200)),
      (1L, "purchase", 60L, sec(60)), (1L, "purchase", 100L, sec(100)),
      (1L, "purchase", 150L, sec(150)), (1L, "purchase", 250L, sec(250)))

    def drive[R](name: String)(mk: org.apache.spark.sql.Dataset[
        StreamingAsOf.AItem] => org.apache.spark.sql.Dataset[R])
        : Seq[org.apache.spark.sql.Row] = {
      val input = MemoryStream[(Long, String, Long, Long)]
      val items = input.toDS()
        .toDF("userId", "kind", "eventId", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
        .withWatermark("ts", "10 seconds")
        .as[StreamingAsOf.AItem]
      val q = mk(items).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(data)
        q.processAllAvailable()
        input.addData(Seq((-1L, "__sentinel__", -1L, sec(86400))))
        q.processAllAvailable()
        input.addData(Seq((-2L, "__sentinel__", -2L, sec(2 * 86400))))
        q.processAllAvailable()
      } finally q.stop()
      LateDrops.assertNone(q, name)
      val rows = spark.table(name).collect().toSeq
      spark.catalog.dropTempView(name)
      rows
    }

    val bwd = drive("asof_pay_b")(
        StreamingAsOf.backward(spark, _, gapSeconds = 3600L))
      .map(r => r.getLong(1) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(bwd == Map(
      60L -> ((None, None)),
      100L -> ((Some(sec(100)), Some(20L))),
      150L -> ((Some(sec(100)), Some(20L))),
      250L -> ((Some(sec(200)), Some(7L)))))

    val fwd = drive("asof_pay_f")(
        StreamingAsOf.forward(spark, _, horizonSeconds = 100L,
          gapSeconds = 3600L))
      .map(r => r.getLong(1) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(fwd == Map(
      60L -> ((Some(sec(100)), Some(10L))),
      100L -> ((Some(sec(100)), Some(20L))),
      150L -> ((Some(sec(200)), Some(5L))),
      250L -> ((None, None))))

    val near = drive("asof_pay_n")(
        StreamingAsOf.nearest(spark, _, horizonSeconds = 100L,
          gapSeconds = 3600L))
      .map(r => r.getLong(1) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(near == Map(
      60L -> ((Some(sec(100)), Some(10L))),
      100L -> ((Some(sec(100)), Some(20L))),
      150L -> ((Some(sec(100)), Some(20L))),
      250L -> ((Some(sec(200)), Some(7L)))))
  }
}
