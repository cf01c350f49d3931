package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Sampling

/** Streaming πps sampler: priority arithmetic identical to the batch
  * kernel's SQL, end-to-end equality with sequentialPoisson under
  * multi-micro-batch arrival, bucket-count invariance (a pure routing
  * knob), the weight<1 contract, bounded per-bucket state, and
  * re-opened-bucket dedup in the merge. */
class StreamingSampleSpec extends SparkSpec {

  import spark.implicits._

  private val IgnoreId = Long.MinValue

  private def sec(s: Long): Long = s * 1000000L

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Full pipeline over (id, weight, tsMicros) rows. */
  private def runPipeline(rows: Seq[(Long, Long, Long)], k: Int,
      seed: Long, nBuckets: Int,
      chunks: Int = 1): Seq[StreamingSample.Sel] = {
    implicit val sqlCtx = spark.sqlContext
    val maxTs = rows.map(_._3).max
    val name = s"sample_spec_${runId.incrementAndGet()}"
    val input = MemoryStream[(Long, Long, Long)]
    val items = input.toDS().toDF("id", "weight", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingSample.Item]
    val q = StreamingSample.topK(spark, items, k = k, seed = seed,
        nBuckets = nBuckets, gapSeconds = 60L, ignoreId = IgnoreId)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val sorted = rows.sortBy(_._3)
      val sz = math.max(1, (sorted.size + chunks - 1) / chunks)
      sorted.grouped(sz).foreach { c =>
        input.addData(c); q.processAllAvailable()
      }
      input.addData((IgnoreId, 1L, maxTs + sec(86400)))
      q.processAllAvailable()
      input.addData((IgnoreId, 1L, maxTs + 2L * sec(86400)))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, name)
    val flushed = spark.table(name).as[StreamingSample.BucketTop]
      .collect().toSeq
    spark.catalog.dropTempView(name)
    // single-batch runs flush each bucket exactly once, so ≤ k rows;
    // multi-chunk runs can time a quiet bucket out mid-stream and
    // re-open it — a second partial top-k is the DOCUMENTED contract
    // (merge re-selects; top-k(A∪B) ⊆ top-k(A) ∪ top-k(B))
    if (chunks == 1)
      assert(flushed.groupBy(_.bucket).values.forall(_.size <= k),
        "a bucket flushed more than k rows")
    StreamingSample.merge(flushed, k)
  }

  private def batchSample(rows: Seq[(Long, Long, Long)], k: Int,
      seed: Long): Seq[StreamingSample.Sel] =
    Sampling.sequentialPoisson(
        rows.toDF("doc_id", "w", "ts"), "doc_id", "w", k, seed)
      .collect().map(r =>
        StreamingSample.Sel(r.getLong(2), r.getLong(0), r.getLong(1))).toSeq

  private def randomRows(n: Int, seedv: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seedv)
    (0 until n).map { i =>
      (i.toLong, 1L + rnd.nextInt(5000).toLong, sec(i.toLong + 1L))
    }
  }

  test("priorityOf matches the batch kernel's SQL expression exactly") {
    val rows = randomRows(500, 1)
    val viaSql = rows.toDF("doc_id", "w", "ts")
      .select(col("doc_id"), Sampling.priority("doc_id", "w", 11L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, w, _) =>
      assert(StreamingSample.priorityOf(id, w, 11L) === viaSql(id),
        s"id=$id w=$w")
    }
  }

  test("stream top-k equals the batch sample, single batch") {
    val rows = randomRows(400, 2)
    assert(runPipeline(rows, k = 50, seed = 11L, nBuckets = 8)
      === batchSample(rows, 50, 11L))
  }

  test("stream top-k equals the batch sample across many micro-batches") {
    val rows = randomRows(600, 3)
    assert(runPipeline(rows, k = 40, seed = 7L, nBuckets = 8, chunks = 7)
      === batchSample(rows, 40, 7L))
  }

  test("bucket count is a pure routing knob — answer invariant") {
    val rows = randomRows(300, 4)
    val expected = batchSample(rows, 25, 11L)
    for (b <- Seq(1, 3, 16)) {
      assert(runPipeline(rows, k = 25, seed = 11L, nBuckets = b) === expected,
        s"nBuckets=$b")
    }
  }

  test("k larger than the population returns everything, sorted") {
    val rows = randomRows(30, 5)
    val got = runPipeline(rows, k = 100, seed = 11L, nBuckets = 4)
    assert(got.size === 30)
    assert(got === batchSample(rows, 100, 11L))
  }

  test("weight < 1 rows are skipped — the batch kernel's contract") {
    val good = randomRows(100, 6)
    val bad = Seq((9000L, 0L, sec(500)), (9001L, -5L, sec(501)))
    val got = runPipeline(good ++ bad, k = 100, seed = 11L, nBuckets = 4)
    assert(got === batchSample(good, 100, 11L))
    assert(!got.exists(s => s.id == 9000L || s.id == 9001L))
  }

  test("merge fails loudly on duplicate flushed rows (unique-id contract)") {
    val a = StreamingSample.BucketTop(0, 10L, 1L, 5L)
    val b = StreamingSample.BucketTop(1, 20L, 2L, 5L)
    val c = StreamingSample.BucketTop(0, 30L, 3L, 5L)
    // a flush removes the bucket's state, so identical flushed rows
    // can only come from a duplicate input id — a contract violation
    // that must error, not silently shrink the sample (ADVICE r12)
    val e = intercept[IllegalArgumentException] {
      StreamingSample.merge(Seq(a, b, a, c), k = 2)
    }
    assert(e.getMessage.contains("ids not unique"))
    assert(StreamingSample.merge(Seq(a, b, c), k = 2)
      === Seq(StreamingSample.Sel(10L, 1L, 5L),
        StreamingSample.Sel(20L, 2L, 5L)))
  }

  /** Full stratified pipeline over (group, id, weight, tsMicros). */
  private def runGroupPipeline(rows: Seq[(String, Long, Long, Long)], k: Int,
      seed: Long, nBuckets: Int,
      chunks: Int = 1): Seq[StreamingSample.GSel] = {
    implicit val sqlCtx = spark.sqlContext
    val maxTs = rows.map(_._4).max
    val name = s"gsample_spec_${runId.incrementAndGet()}"
    val input = MemoryStream[(String, Long, Long, Long)]
    val items = input.toDS().toDF("group", "id", "weight", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingSample.GItem]
    val q = StreamingSample.topKByGroup(spark, items, k = k, seed = seed,
        nBuckets = nBuckets, gapSeconds = 60L, ignoreId = IgnoreId)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val sorted = rows.sortBy(_._4)
      val sz = math.max(1, (sorted.size + chunks - 1) / chunks)
      sorted.grouped(sz).foreach { c =>
        input.addData(c); q.processAllAvailable()
      }
      input.addData(("", IgnoreId, 1L, maxTs + sec(86400)))
      q.processAllAvailable()
      input.addData(("", IgnoreId, 1L, maxTs + 2L * sec(86400)))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, name)
    val flushed = spark.table(name).as[StreamingSample.GroupBucketTop]
      .collect().toSeq
    spark.catalog.dropTempView(name)
    // same single-flush bound caveat as runPipeline: a quiet
    // (group, bucket) key can time out mid-stream and re-open
    if (chunks == 1)
      assert(flushed.groupBy(r => (r.group, r.bucket)).values
        .forall(_.size <= k), "a (group, bucket) key flushed more than k rows")
    StreamingSample.mergeByGroup(flushed, k)
  }

  private def batchGroupSample(rows: Seq[(String, Long, Long, Long)], k: Int,
      seed: Long): Seq[StreamingSample.GSel] =
    Sampling.sequentialPoissonByGroup(
        rows.toDF("g", "doc_id", "w", "ts"), "g", "doc_id", "w", k, seed)
      .collect().map(r => StreamingSample.GSel(r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq.sortBy(s => (s.group, s.rk))

  private def randomGroupRows(n: Int,
      seedv: Int): Seq[(String, Long, Long, Long)] = {
    val rnd = new scala.util.Random(seedv)
    val langs = Seq("en", "de", "fr", "ja")
    (0 until n).map { i =>
      (langs(rnd.nextInt(langs.size)), i.toLong,
        1L + rnd.nextInt(5000).toLong, sec(i.toLong + 1L))
    }
  }

  test("stratified stream top-k equals the batch per-group sample") {
    val rows = randomGroupRows(500, 10)
    assert(runGroupPipeline(rows, k = 15, seed = 11L, nBuckets = 8)
      === batchGroupSample(rows, 15, 11L))
  }

  test("stratified parity holds across many micro-batches and any bucketing") {
    val rows = randomGroupRows(400, 11)
    val expected = batchGroupSample(rows, 10, 7L)
    assert(runGroupPipeline(rows, k = 10, seed = 7L, nBuckets = 8,
      chunks = 5) === expected)
    for (b <- Seq(1, 3)) {
      assert(runGroupPipeline(rows, k = 10, seed = 7L, nBuckets = b)
        === expected, s"nBuckets=$b")
    }
  }

  test("a group smaller than k returns all its rows, ranked") {
    val rows = randomGroupRows(200, 12) :+ (("zz", 9999L, 42L, sec(9999)))
    val got = runGroupPipeline(rows, k = 50, seed = 11L, nBuckets = 4)
    assert(got.filter(_.group == "zz") ===
      Seq(StreamingSample.GSel("zz", 9999L, 42L,
        StreamingSample.priorityOf(9999L, 42L, 11L), 1)))
    assert(got === batchGroupSample(rows, 50, 11L))
  }

  test("mergeByGroup fails loudly on duplicates and ranks per group") {
    val a = StreamingSample.GroupBucketTop("en", 0, 10L, 1L, 5L)
    val b = StreamingSample.GroupBucketTop("en", 1, 20L, 2L, 5L)
    val c = StreamingSample.GroupBucketTop("de", 0, 30L, 3L, 5L)
    intercept[IllegalArgumentException] {
      StreamingSample.mergeByGroup(Seq(a, b, a, c), k = 1)
    }
    val got = StreamingSample.mergeByGroup(Seq(a, b, c), k = 1)
    assert(got === Seq(StreamingSample.GSel("de", 3L, 5L, 30L, 1),
      StreamingSample.GSel("en", 1L, 5L, 10L, 1)))
  }

  test("negative ids route and select consistently") {
    // the kernel documents non-negative ids for oracle parity, but the
    // fold + batch kernel must still agree on any i64 (both use the
    // same sign-preserving % and the same div)
    val rows = Seq((-5L, 10L, sec(1)), (-4L, 20L, sec(2)),
      (7L, 30L, sec(3)), (8L, 40L, sec(4)))
    assert(runPipeline(rows, k = 3, seed = 11L, nBuckets = 4)
      === batchSample(rows, 3, 11L))
  }
}
