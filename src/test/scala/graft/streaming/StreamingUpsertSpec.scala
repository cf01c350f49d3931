package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streaming upsert must compact to EXACTLY the batch
  * max(struct(ts, event_id, value)) rows across any micro-batch split
  * and arrival order — including the event_id tiebreak on equal ts. */
class StreamingUpsertSpec extends SparkSpec {

  import spark.implicits._

  private def sec(s: Long): Long = s * 1000000L

  // (userId, eventType, eventId, value, tsMicros): key (7, "b") has an
  // exact-ts tie broken by event_id; key (5, "a") updates out of order;
  // key (11, "c") is a redelivered id with an AMENDED payload — same
  // (ts, event_id), different value — resolved by the struct's third
  // field exactly as the batch max(struct(ts, event_id, value)) does
  private val rows: Seq[(Long, String, Long, Double, Long)] = Seq(
    (5L, "a", 1L, 1.0, sec(10)),
    (5L, "a", 4L, 4.0, sec(40)),
    (5L, "a", 2L, 2.0, sec(20)),
    (7L, "b", 3L, 3.0, sec(30)),
    (7L, "b", 6L, 6.0, sec(30)),
    (7L, "b", 5L, 5.0, sec(30)),
    (11L, "c", 8L, 1.5, sec(25)),
    (11L, "c", 8L, 9.5, sec(25)),
    (9L, "a", 7L, 7.0, sec(15)))

  private def run(batches: Seq[Seq[(Long, String, Long, Double, Long)]])
      : Map[(Long, String), (Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val maxTs = rows.map(_._5).max
    val input = MemoryStream[(Long, String, Long, Double, Long)]
    val items = input.toDS()
      .toDF("userId", "eventType", "eventId", "value", "tsMicros")
      // delay > the 30 s data span: reverse-order per-row batches must
      // not shed rows as late (LateDrops would flag it) — the claim
      // under test is the fold's commutativity, not watermark shedding
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "100 seconds")
      .as[StreamingUpsert.UItem]
    val q = StreamingUpsert.latest(spark, items, gapSeconds = 60L,
        ignoreType = "__sentinel__")
      .writeStream.format("memory").queryName("up_tw")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData((-1L, "__sentinel__", -1L, 0.0, maxTs + sec(86400)))
      q.processAllAvailable()
      input.addData((-2L, "__sentinel__", -2L, 0.0, maxTs + 2L * sec(86400)))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "up_tw")
    val got = spark.table("up_tw").as[StreamingUpsert.ULatest].collect()
      .map(r => (r.userId, r.eventType) -> ((r.tsMicros, r.eventId, r.value)))
      .toMap
    spark.catalog.dropTempView("up_tw")
    got
  }

  private val want: Map[(Long, String), (Long, Long, Double)] =
    rows.toDF("userId", "eventType", "eventId", "value", "tsMicros")
      .groupBy("userId", "eventType")
      .agg(max(struct(col("tsMicros"), col("eventId"), col("value")))
        .as("l"))
      .select(col("userId"), col("eventType"),
        col("l.tsMicros"), col("l.eventId"), col("l.value"))
      .as[(Long, String, Long, Long, Double)].collect()
      .map { case (u, t, ts, id, v) => (u, t) -> ((ts, id, v)) }.toMap

  test("one batch: compacted rows equal the batch aggregate, tie on event_id") {
    val got = run(Seq(rows))
    assert(got == want)
    assert(got((7L, "b")) == ((sec(30), 6L, 6.0))) // ts tie -> max event_id
    assert(got((11L, "c")) == ((sec(25), 8L, 9.5))) // (ts, id) tie -> max value
  }

  test("order-free: per-row batches in reverse arrival order, same rows") {
    assert(run(rows.reverse.map(Seq(_))) == want)
  }

  test("split mid-key: a key updated across batches keeps its max") {
    val (a, b) = rows.splitAt(2) // (5,"a") spans both batches
    assert(run(Seq(a, b)) == want)
  }
}
