package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming heavy hitters: candidate superset under forced MG
  * evictions, exact end-to-end recount parity with the naive count,
  * flush-on-data when the sentinel bucket can never time out, and
  * exactly-once recount folding. */
class StreamingHeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private val Ignore = " "

  private def sec(s: Long): Long = s * 1000000L

  /** Runs pass 1 over `rows` (item, tsMicros), returns distinct
    * candidate items; two sentinel nudges flush every bucket. */
  private def runCandidates(rows: Seq[(String, Long)], k: Int,
      nBuckets: Int, ppm: Int, name: String): Array[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    input.addData(rows)
    val maxTs = rows.map(_._2).max
    input.addData((Ignore, maxTs + sec(86400)))
    // no withWatermark: candidates() attaches the query's one watermark
    // itself, downstream of its map-side pre-combine
    val items = input.toDS().toDF("item", "tsMicros")
      .as[StreamingHeavyHitters.Item]
    val q = StreamingHeavyHitters.candidates(spark, items, k = k,
        nBuckets = nBuckets, ppm = ppm, gapSeconds = 60L,
        ignoreItem = Ignore)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData((Ignore, maxTs + 2L * sec(86400)))
      q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, name)
    val out = spark.table(name).select(col("item")).distinct()
      .as[String].collect()
    spark.catalog.dropTempView(name)
    out
  }

  /** Pass 2 over a fresh replay of `rows`. */
  private def runRecount(rows: Seq[(String, Long)], cands: Array[String])
      : StreamingHeavyHitters.ExactRecount = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    input.addData(rows)
    val rec = new StreamingHeavyHitters.ExactRecount(spark, cands, Ignore)
    val q = input.toDS().toDF("item", "tsMicros").writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => rec.addBatch(df.toDF(), id))
      .start()
    try q.processAllAvailable() finally q.stop()
    rec
  }

  private def naiveHeavy(rows: Seq[(String, Long)], ppm: Int): Map[String, Long] = {
    val n = rows.size.toLong
    val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
    rows.groupBy(_._1).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
  }

  // 10% threshold with k = 19 counters per bucket: the 60 unique cold
  // items force constant evictions in every bucket (k far below the
  // bucket vocabulary), which is exactly the regime the superset
  // argument must survive
  private val skewed: Seq[(String, Long)] = {
    val hot = Seq.fill(30)("hot")
    val warm = Seq.fill(15)("warm")
    val cold = (1 to 60).map(i => s"cold_$i")
    (hot ++ warm ++ cold).zipWithIndex.map { case (s, i) => (s, sec(i + 1)) }
  }

  test("end-to-end: candidates ⊇ heavy set, recount output exact") {
    val ppm = 100000
    val cands = runCandidates(skewed, k = 19, nBuckets = 4, ppm = ppm,
      name = "hh_e2e")
    val want = naiveHeavy(skewed, ppm)
    assert(want.keySet == Set("hot", "warm")) // test is non-vacuous
    assert(want.keySet.subsetOf(cands.toSet), s"candidates lost a heavy item: ${cands.toSeq}")
    assert(!cands.contains(Ignore))
    val rec = runRecount(skewed, cands)
    assert(rec.streamLength == skewed.size.toLong)
    assert(rec.result(ppm).toMap == want)
  }

  test("single bucket: the sentinel bucket flushes via flush-on-data") {
    // nBuckets = 1 puts every row AND both sentinels in one group key,
    // so the event-time timeout can never fire for it (each sentinel
    // call resets the timeout) — the data-branch watermark check is
    // the only way this bucket's candidates get out
    val ppm = 100000
    val cands = runCandidates(skewed, k = 19, nBuckets = 1, ppm = ppm,
      name = "hh_one_bucket")
    assert(Set("hot", "warm").subsetOf(cands.toSet))
  }

  test("emitBucketCounts: null-item flush rows sum to the exact stream length") {
    // multi-batch + multi-bucket + forced evictions: every data row
    // must land in exactly one flush epoch's nb, sentinels in none
    implicit val sqlCtx = spark.sqlContext
    val (chunk1, chunk2) = skewed.splitAt(40)
    val input = MemoryStream[(String, Long)]
    val items = input.toDS().toDF("item", "tsMicros")
      .as[StreamingHeavyHitters.Item]
    val q = StreamingHeavyHitters.candidates(spark, items, k = 19,
        nBuckets = 4, ppm = 100000, gapSeconds = 60L, ignoreItem = Ignore,
        emitBucketCounts = true)
      .writeStream.format("memory").queryName("hh_nb")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(chunk1); q.processAllAvailable()
      input.addData(chunk2); q.processAllAvailable()
      val maxTs = skewed.map(_._2).max
      input.addData((Ignore, maxTs + sec(86400))); q.processAllAvailable()
      input.addData((Ignore, maxTs + 2L * sec(86400))); q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "hh_nb")
    val rows = spark.table("hh_nb")
      .select(col("item"), col("wLower")).collect()
    spark.catalog.dropTempView("hh_nb")
    val n = rows.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    assert(n == skewed.size.toLong,
      s"bucket counts sum to $n, stream length is ${skewed.size}")
    // and the candidate superset is unchanged by the extra rows
    val cands = rows.filter(!_.isNullAt(0)).map(_.getString(0)).toSet
    assert(Set("hot", "warm").subsetOf(cands))
  }

  test("recount drops replayed batch ids (exactly-once fold)") {
    val items = Seq(("a", sec(1)), ("a", sec(2)), ("b", sec(3)))
    val rec = new StreamingHeavyHitters.ExactRecount(spark,
      Array("a", "b"), Ignore)
    val df = items.toDF("item", "tsMicros")
    rec.addBatch(df, 0L)
    rec.addBatch(df, 0L) // replay of the same batch: must be a no-op
    rec.addBatch(df, 1L)
    assert(rec.streamLength == 6L)
    assert(rec.result(400000).toMap == Map("a" -> 4L)) // thr = ceil(2.4) = 3
  }

  test("recount: ignore rows feed neither counts nor stream length") {
    val rec = new StreamingHeavyHitters.ExactRecount(spark,
      Array("a"), Ignore)
    rec.addBatch(Seq(("a", 1L), (Ignore, 2L), ("x", 3L)).toDF("item", "tsMicros"), 0L)
    assert(rec.streamLength == 2L)
    assert(rec.result(1).toMap == Map("a" -> 1L))
  }

  test("multi-batch folding: state merges across micro-batches exactly") {
    // feed against a RUNNING query so each chunk is its own
    // micro-batch — the per-bucket sketch must fold across batches
    implicit val sqlCtx = spark.sqlContext
    val ppm = 100000
    val (chunk1, chunk2) = skewed.splitAt(40)
    val input = MemoryStream[(String, Long)]
    val items = input.toDS().toDF("item", "tsMicros")
      .as[StreamingHeavyHitters.Item]
    val q = StreamingHeavyHitters.candidates(spark, items, k = 19,
        nBuckets = 4, ppm = ppm, gapSeconds = 3600L, ignoreItem = Ignore)
      .writeStream.format("memory").queryName("hh_multi")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(chunk1); q.processAllAvailable()
      input.addData(chunk2); q.processAllAvailable()
      val maxTs = skewed.map(_._2).max
      input.addData((Ignore, maxTs + sec(86400))); q.processAllAvailable()
      input.addData((Ignore, maxTs + 2L * sec(86400))); q.processAllAvailable()
    } finally q.stop()
    LateDrops.assertNone(q, "hh_multi")
    val cands = spark.table("hh_multi").select(col("item")).distinct()
      .as[String].collect()
    spark.catalog.dropTempView("hh_multi")
    assert(Set("hot", "warm").subsetOf(cands.toSet))
    val rec = runRecount(skewed, cands)
    assert(rec.result(ppm).toMap == naiveHeavy(skewed, ppm))
  }
}
