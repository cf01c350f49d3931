package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The order-free sketch twins must be BIT-EQUAL to their batch
  * aggregates across micro-batch splits — that is the whole claim. */
class StreamingSketchesSpec extends SparkSpec {

  import spark.implicits._

  private val Ignore = "zz_ignore"

  private def sec(s: Long): Long = s * 1000000L

  private val docs: Seq[(String, String, Long)] =
    Seq("alpha beta", "beta gamma delta", "alpha", "epsilon zeta eta",
      "beta beta alpha", "theta", "gamma gamma", "iota kappa",
      "alpha delta", "mu nu xi omicron pi").zipWithIndex.map {
      case (t, i) => (if (i % 2 == 0) "en" else "de", t, sec(i + 1))
    }

  test("hll twin: registers bit-equal to the batch aggregate across batches") {
    import graft.functions.{HllSketch, NativeExpressions}
    implicit val sqlCtx = spark.sqlContext
    val maxTs = docs.map(_._3).max
    val input = MemoryStream[(String, String, Long)]
    val items = input.toDS().toDF("lang", "text", "tsMicros")
      .select(when(col("tsMicros") > lit(maxTs), lit(Ignore))
          .otherwise(col("lang")).as("group"),
        NativeExpressions.charHash(col("text"), 7L).as("h"), col("tsMicros"))
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingSketches.HItem]
    val q = StreamingSketches.hllRegisters(spark, items, m = 16,
        budgetBits = 24, gapSeconds = 60L, ignoreGroup = Ignore)
      .writeStream.format("memory").queryName("hll_tw")
      .outputMode(OutputMode.Append()).start()
    try {
      val (c1, c2) = docs.splitAt(4)
      input.addData(c1); q.processAllAvailable()
      input.addData(c2); q.processAllAvailable()
      input.addData(("??", "", maxTs + sec(86400))); q.processAllAvailable()
      input.addData(("??", "", maxTs + 2L * sec(86400))); q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "hll_tw")
    val got = spark.table("hll_tw")
      .as[StreamingSketches.HllRow].collect()
      .map(r => r.group -> r.regs.toSeq).toMap
    spark.catalog.dropTempView("hll_tw")
    val want = docs.toDF("lang", "text", "tsMicros")
      .groupBy("lang")
      .agg(HllSketch.registers(
        graft.functions.NativeExpressions.charHash(col("text"), 7L),
        m = 16, budgetBits = 24).as("regs"))
      .as[(String, Seq[Int])].collect().toMap
    assert(got == want) // bit-equal registers, both groups
    assert(got.keySet == Set("en", "de"))
  }

  test("bloom twin: flushed words bit-equal to the batch build across batches") {
    import graft.dedup.Bloom
    import graft.functions.NativeExpressions
    implicit val sqlCtx = spark.sqlContext
    val maxTs = docs.map(_._3).max
    val key = NativeExpressions.charHash(col("text"), 7L)
    val input = MemoryStream[(String, String, Long)]
    val items = Bloom.streamWordMasks(
        input.toDS().toDF("lang", "text", "tsMicros")
          .where(col("lang") === "en" || col("tsMicros") > lit(maxTs)),
        key, sentinel = col("tsMicros") > lit(maxTs))
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingSketches.BItem]
    val q = StreamingSketches.bloomWords(spark, items, gapSeconds = 60L)
      .writeStream.format("memory").queryName("bloom_tw")
      .outputMode(OutputMode.Append()).start()
    try {
      val (c1, c2) = docs.splitAt(3)
      input.addData(c2); q.processAllAvailable() // out of staged order
      input.addData(c1); q.processAllAvailable()
      input.addData(("??", "", maxTs + sec(86400))); q.processAllAvailable()
      input.addData(("??", "", maxTs + 2L * sec(86400))); q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "bloom_tw")
    val got = spark.table("bloom_tw")
      .as[StreamingSketches.BloomWord].collect()
      .map(w => w.word -> w.bits).toMap
    spark.catalog.dropTempView("bloom_tw")
    val want = Bloom.build(
        docs.toDF("lang", "text", "tsMicros").where(col("lang") === "en"), key)
      .as[(Long, Long)].collect().toMap
    assert(got == want) // bit-equal words
    assert(got.nonEmpty)
  }

  test("cm twin: cell table bit-equal to the batch sketch across batches") {
    import graft.text.CmSketch
    implicit val sqlCtx = spark.sqlContext
    val d = 3; val w = 8; val seed = 7L
    val maxTs = docs.map(_._3).max
    val input = MemoryStream[(String, Long)]
    val tokens = input.toDS().toDF("text", "tsMicros")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"),
        col("tsMicros"))
    val items = tokens
      .select(explode(array((0 until d).map(r =>
          struct(lit(r).as("r"),
            CmSketch.bucket(col("token"), r, w, seed).as("b"))): _*)).as("rb"),
        col("tsMicros"))
      .select(when(col("tsMicros") > lit(maxTs), lit(-1))
          .otherwise(col("rb.r")).as("row"),
        col("rb.b").as("bucket"), col("tsMicros"))
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingSketches.CItem]
    val q = StreamingSketches.cmCells(spark, items, w = w, gapSeconds = 60L)
      .writeStream.format("memory").queryName("cm_tw")
      .outputMode(OutputMode.Append()).start()
    try {
      val (c1, c2) = docs.map(dd => (dd._2, dd._3)).splitAt(5)
      input.addData(c1); q.processAllAvailable()
      input.addData(c2); q.processAllAvailable()
      input.addData(("s", maxTs + sec(86400))); q.processAllAvailable()
      input.addData(("s", maxTs + 2L * sec(86400))); q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "cm_tw")
    val got = spark.table("cm_tw")
      .as[StreamingSketches.CmCell].collect()
      .map(c => (c.row, c.bucket) -> c.n).toMap
    spark.catalog.dropTempView("cm_tw")
    val want = CmSketch.sketch(
        docs.toDF("lang", "text", "tsMicros")
          .select(explode(graft.text.TextOps.tokens(col("text"))).as("token")),
        "token", d = d, w = w, seed = seed)
      .as[(Int, Int, Long)].collect()
      .map { case (r, b, n) => (r, b) -> n }.toMap
    assert(got == want) // bit-equal non-empty cells
    assert(got.nonEmpty)
  }
}
