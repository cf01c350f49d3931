package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming winsorized stats: end-to-end bit-parity with the batch
  * kernel (the gate's claim), width invariance (the tuning knob can
  * never move the answer), the lo/hi-same-bucket and negative-value
  * edges, multi-micro-batch arrival, histogram additivity for
  * re-opened groups, and exactly-once refinement folding. */
class StreamingWinsorizedSpec extends SparkSpec {

  import spark.implicits._

  private val Ignore = " ignore"

  private def sec(s: Long): Long = s * 1000000L

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Full two-pass pipeline over (group, v, tsMicros) rows. */
  private def runPipeline(rows: Seq[(String, Long, Long)], width: Long,
      loP: Int, hiP: Int,
      chunks: Int = 1): Seq[StreamingWinsorized.WinsorizedRow] = {
    implicit val sqlCtx = spark.sqlContext
    val maxTs = rows.map(_._3).max
    val name = s"wins_spec_${runId.incrementAndGet()}"
    // ---- pass 1 ----
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
      // chunked adds against the RUNNING query → real multi-batch
      // arrival (each chunk its own micro-batch); chunks ordered by
      // ts so watermark advance never drops rows
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
    val bands = StreamingWinsorized.bandBuckets(hist, loP, hiP)
    // ---- pass 2 (replay) ----
    val input2 = MemoryStream[(String, Long, Long)]
    input2.addData(rows)
    val ref = new StreamingWinsorized.BandRefiner(spark, bands, width, Ignore)
    val q2 = input2.toDS().toDF("group", "v", "tsMicros").writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => ref.addBatch(df.toDF(), id))
      .start()
    try q2.processAllAvailable() finally q2.stop()
    ref.result(loP, hiP)
  }

  /** Batch-kernel truth over the same rows (bit-level authority). */
  private def batchTruth(rows: Seq[(String, Long, Long)], loP: Int, hiP: Int)
      : Map[String, (Long, Long, Long, Double, Double, Double, Double, Double)] =
    graft.ops.Quantiles.winsorizedStats(
        rows.map(r => (r._1, r._2)).toDF("group", "_val"),
        Seq("group"), col("_val"), loP, hiP)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
      .toMap

  private def asMap(out: Seq[StreamingWinsorized.WinsorizedRow])
      : Map[String, (Long, Long, Long, Double, Double, Double, Double, Double)] =
    out.map(r => r.group -> (r.nTotal, r.loValue, r.hiValue,
      r.winsorizedSum, r.winsorizedSumSq, r.winsorizedMean,
      r.winsorizedVar, r.winsorizedStd)).toMap

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randomRows(seed: Long, n: Int, groups: Int,
      lo: Long, hi: Long): Seq[(String, Long, Long)] = {
    val r = rng(seed)
    (1 to n).map { i =>
      (s"g${r.nextInt(groups)}", lo + math.abs(r.nextLong()) % (hi - lo + 1),
        sec(i.toLong))
    }
  }

  test("randomized end-to-end bit-parity with the batch kernel") {
    val rows = randomRows(seed = 7L, n = 4000, groups = 3,
      lo = 100L, hi = 2000000L)
    val out = asMap(runPipeline(rows, width = 4096L, loP = 10, hiP = 990))
    assert(out == batchTruth(rows, 10, 990))
  }

  test("width is a pure tuning knob: 1, prime, and single-bucket widths agree") {
    val rows = randomRows(seed = 11L, n = 1200, groups = 2, lo = 0L, hi = 5000L)
    val truth = batchTruth(rows, 50, 950)
    for (w <- Seq(1L, 97L, 1000000000L)) {
      assert(asMap(runPipeline(rows, width = w, loP = 50, hiP = 950)) == truth,
        s"width=$w diverged")
    }
  }

  test("lo and hi ranks in the SAME bucket, including hiP=1000") {
    // narrow value range + wide bucket → one bucket holds both ranks
    val rows = (1 to 500).map(i => ("g", 1000L + (i % 7).toLong, sec(i.toLong)))
    val out = asMap(runPipeline(rows, width = 1 << 20, loP = 10, hiP = 1000))
    assert(out == batchTruth(rows, 10, 1000))
  }

  test("negative values: floorDiv bucketing matches the batch kernel") {
    val r = rng(13L)
    val rows = (1 to 900).map(i =>
      (s"g${i % 2}", r.nextLong() % 10000L, sec(i.toLong))) // signed values
    val out = asMap(runPipeline(rows, width = 256L, loP = 25, hiP = 975))
    assert(out == batchTruth(rows, 25, 975))
  }

  test("multi-micro-batch arrival equals single-batch arrival") {
    val rows = randomRows(seed = 17L, n = 2000, groups = 2, lo = 0L, hi = 99999L)
    val once = asMap(runPipeline(rows, width = 512L, loP = 10, hiP = 990))
    val chunked = asMap(runPipeline(rows, width = 512L, loP = 10, hiP = 990,
      chunks = 5))
    assert(once == chunked)
    assert(once == batchTruth(rows, 10, 990))
  }

  test("bandBuckets sums duplicate histogram rows from re-opened groups") {
    import StreamingWinsorized.BucketCount
    // 10 rows in bucket 0, 10 in bucket 1 — but bucket 1 split across
    // two flushes (a re-opened group emits twice)
    val hist = Seq(BucketCount("g", 0L, 10L), BucketCount("g", 1L, 4L),
      BucketCount("g", 1L, 6L))
    val b = StreamingWinsorized.bandBuckets(hist, 100, 900)
    assert(b("g").nPass1 == 20L)
    assert(b("g").loBucket == 0L) // rank ceil(20·100/1000)=2 → bucket 0
    assert(b("g").hiBucket == 1L) // rank ceil(20·900/1000)=18 → bucket 1
  }

  test("refinement fold is exactly-once: a replayed batch id is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 100).map(i => ("g", i.toLong, sec(i.toLong)))
    val bands = Map("g" -> StreamingWinsorized.Band(0L, 0L, 100L))
    val ref = new StreamingWinsorized.BandRefiner(spark, bands,
      width = 1L << 20, ignoreGroup = Ignore)
    val df = rows.toDF("group", "v", "tsMicros")
    ref.addBatch(df, 0L)
    ref.addBatch(df, 0L) // replay of the same batch id: dropped
    assert(ref.groupCounts == Map("g" -> 100L))
    val out = asMap(ref.result(10, 990))
    assert(out == batchTruth(rows, 10, 990))
  }

  test("sentinel rows are dropped inside the fold, not filtered upstream") {
    // a group named exactly the ignore marker contributes nothing
    val rows = (1 to 300).map(i => ("g", i.toLong, sec(i.toLong)))
    val out = asMap(runPipeline(rows, width = 64L, loP = 10, hiP = 990))
    assert(out.keySet == Set("g"))
    assert(out == batchTruth(rows, 10, 990))
  }
}
