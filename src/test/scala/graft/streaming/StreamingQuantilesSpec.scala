package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming exact quantiles (the 19th parity gate's kernel):
  * end-to-end value parity with the batch rank-selection kernel,
  * width invariance (the tuning knob can never move the answer),
  * negative values (floorDiv bucketing), multi-micro-batch arrival,
  * exactly-once pass-2 folding, and the ENFORCED replay-faithfulness
  * guard (an unfaithful replay throws, never silently shifts a
  * value). */
class StreamingQuantilesSpec extends SparkSpec {

  import spark.implicits._

  private val Ignore = " ignore"

  private def sec(s: Long): Long = s * 1000000L

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Full two-pass pipeline over (group, v, tsMicros) rows. */
  private def runPipeline(rows: Seq[(String, Long, Long)], width: Long,
      ps: Seq[Int], chunks: Int = 1): Map[(String, Int), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val maxTs = rows.map(_._3).max
    val name = s"quant_spec_${runId.incrementAndGet()}"
    // ---- pass 1 (the winsorized twin's histogram, verbatim) ----
    val input = MemoryStream[(String, Long, Long)]
    val items = input.toDS().toDF("group", "v", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingWinsorized.VItem]
    val q = StreamingWinsorized.histogram(spark, items, width = width,
        gapSeconds = 60L, ignoreGroup = Ignore)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val sorted = rows.sortBy(_._3)
      val sz = math.max(1, (sorted.size + chunks - 1) / chunks)
      sorted.grouped(sz).foreach { c =>
        input.addData(c); q.processAllAvailable()
      }
      input.addData((Ignore, 0L, maxTs + sec(86400)))
      q.processAllAvailable()
      input.addData((Ignore, 0L, maxTs + 2L * sec(86400)))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, name)
    val hist = spark.table(name).as[StreamingWinsorized.BucketCount]
      .collect().toSeq
    spark.catalog.dropTempView(name)
    // ---- pass 2: one bounded batch job over the "retained" rows ----
    val res = new StreamingQuantiles.RankResolver(spark, hist, ps, width,
      Ignore)
    res.addBatch(rows.toDF("group", "v", "tsMicros")
      .select(col("group"), col("v")), 0L)
    res.result().map(r => (r.group, r.pPermille) -> r.value).toMap
  }

  /** Batch-kernel truth over the same rows. */
  private def batchTruth(rows: Seq[(String, Long, Long)],
      ps: Seq[Int]): Map[(String, Int), Long] =
    graft.ops.Quantiles.exactByGroup(
        rows.map(r => (r._1, r._2)).toDF("group", "_val"),
        Seq("group"), col("_val"), ps)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap

  private def randomRows(seed: Long, n: Int, groups: Int,
      lo: Long, hi: Long): Seq[(String, Long, Long)] = {
    val r = new scala.util.Random(seed)
    (1 to n).map { i =>
      (s"g${r.nextInt(groups)}", lo + math.abs(r.nextLong()) % (hi - lo + 1),
        sec(i.toLong))
    }
  }

  private val Ps = Seq(250, 500, 750, 900, 990)

  test("randomized end-to-end parity with the batch rank-selection kernel") {
    val rows = randomRows(seed = 7L, n = 4000, groups = 3,
      lo = 100L, hi = 2000000L)
    assert(runPipeline(rows, width = 4096L, Ps) == batchTruth(rows, Ps))
  }

  test("width is a pure tuning knob: 1, prime, and single-bucket widths agree") {
    val rows = randomRows(seed = 11L, n = 1200, groups = 2, lo = 0L, hi = 5000L)
    val truth = batchTruth(rows, Ps)
    for (w <- Seq(1L, 97L, 1000000000L)) {
      assert(runPipeline(rows, width = w, Ps) == truth, s"width=$w diverged")
    }
  }

  test("p=1 and p=1000 hit the group's min and max, negative values included") {
    val r = new scala.util.Random(13L)
    val rows = (1 to 900).map(i =>
      (s"g${i % 2}", r.nextLong() % 10000L, sec(i.toLong))) // signed values
    val ps = Seq(1, 500, 1000)
    val got = runPipeline(rows, width = 256L, ps)
    assert(got == batchTruth(rows, ps))
    for (g <- Seq("g0", "g1")) {
      val vs = rows.filter(_._1 == g).map(_._2)
      assert(got((g, 1)) == vs.min)
      assert(got((g, 1000)) == vs.max)
    }
  }

  test("multi-micro-batch arrival equals single-batch arrival") {
    val rows = randomRows(seed = 17L, n = 2000, groups = 2, lo = 0L, hi = 99999L)
    val once = runPipeline(rows, width = 512L, Ps)
    assert(once == runPipeline(rows, width = 512L, Ps, chunks = 5))
    assert(once == batchTruth(rows, Ps))
  }

  test("pass-2 fold is exactly-once: a replayed batch id is dropped") {
    val rows = (1 to 100).map(i => ("g", i.toLong, sec(i.toLong)))
    val hist = rows.groupBy(r => Math.floorDiv(r._2, 16L)).toSeq
      .map { case (b, rs) =>
        StreamingWinsorized.BucketCount("g", b, rs.size.toLong) }
    val res = new StreamingQuantiles.RankResolver(spark, hist, Seq(500),
      width = 16L, Ignore)
    val df = rows.toDF("group", "v", "tsMicros").select(col("group"), col("v"))
    res.addBatch(df, 0L)
    res.addBatch(df, 0L) // replay of the same batch id: dropped
    assert(res.result().map(r => (r.group, r.pPermille) -> r.value).toMap
      == Map(("g", 500) -> 50L))
  }

  test("unfaithful replay fails loudly (enforced pass-1 recount)") {
    val rows = (1 to 100).map(i => ("g", i.toLong, sec(i.toLong)))
    val hist = rows.groupBy(r => Math.floorDiv(r._2, 16L)).toSeq
      .map { case (b, rs) =>
        StreamingWinsorized.BucketCount("g", b, rs.size.toLong) }
    val res = new StreamingQuantiles.RankResolver(spark, hist, Seq(500),
      width = 16L, Ignore)
    // replay DROPS half the rows — the guard must throw, not shift
    res.addBatch(rows.take(50).toDF("group", "v", "tsMicros")
      .select(col("group"), col("v")), 0L)
    val e = intercept[IllegalArgumentException](res.result())
    assert(e.getMessage.contains("unfaithful replay"))
  }

  test("outlierCounts == the batch own-p99 kernel on random data") {
    val rows = randomRows(seed = 23L, n = 3000, groups = 3,
      lo = 0L, hi = 500000L)
    // full two-pass pipeline, then the outlier algebra off the resolver
    implicit val sqlCtx = spark.sqlContext
    val hist = rows.groupBy(r => (r._1, Math.floorDiv(r._2, 512L))).toSeq
      .map { case ((g, b), rs) =>
        StreamingWinsorized.BucketCount(g, b, rs.size.toLong) }
    val res = new StreamingQuantiles.RankResolver(spark, hist, Seq(990),
      width = 512L, Ignore)
    res.addBatch(rows.toDF("group", "v", "tsMicros")
      .select(col("group"), col("v")), 0L)
    val got = res.outlierCounts(990)
      .map(r => r.group -> (r.nTotal, r.nAbove)).toMap
    val want = graft.ops.Quantiles.outlierCounts(
        rows.map(r => (r._1, r._2)).toDF("group", "_val"),
        Seq("group"), col("_val"), 990)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // p must be a constructor target
    intercept[IllegalArgumentException](res.outlierCounts(500))
  }

  test("sentinel rows are dropped inside the pass-2 fold") {
    val rows = (1 to 300).map(i => ("g", i.toLong, sec(i.toLong)))
    val got = runPipeline(rows, width = 64L, Seq(500))
    assert(got.keySet == Set(("g", 500)))
    assert(got == batchTruth(rows, Seq(500)))
  }
}
