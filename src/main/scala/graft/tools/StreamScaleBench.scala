package graft.tools

import java.io.File

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.{GraftSession, Tables}
import graft.streaming.{StreamingDrift, StreamingFunnel, StreamingDfg,
  StreamingThrottle, TraceAssembly}

/** Streaming scale audit under a REAL file source (VERDICT r8 item 2):
  * the MemoryStream parity harness buffers its whole input on the
  * driver and OOMs at ×100 (SCALE.md) — a harness bound, not an
  * operator bound. This tool lifts it: the inflated events table is
  * staged as TIME-SLICED parquet files with ascending modification
  * times, `readStream` + `maxFilesPerTrigger` consumes them as a
  * multi-micro-batch stream (the watermark advances between batches,
  * exactly like a real ingestion tail), and three streaming operators
  * run with NOTHING data-proportional on the driver:
  *
  *  - funnel (StreamingFunnel.reached, whole-history gap): per-case
  *    keyed state, all cases flushed by the final event-time timers;
  *  - dfg (TraceAssembly → StreamingDfg.edges, whole-history gap):
  *    closed-trace edge emission, folded per batch;
  *  - drift (StreamingDrift.monitor, tumbling day windows): windows
  *    CLOSE MID-STREAM as the watermark passes each window end — the
  *    state-eviction path under genuine multi-batch advance (state
  *    peaks at open-windows × alphabet, not stream length).
  *
  * Every query sinks via foreachBatch: the per-batch fold (stage
  * counts / edge counts / window rows) is computed distributed and
  * only alphabet-sized aggregates cross to the driver. Results are
  * compared EXACTLY against batch computations over the same staged
  * files (Funnel.orderedStages; whole-case directly-follows; the
  * drift oracle's integer L1 algebra).
  *
  * Time-ordered slices make the stream late-event-free by
  * construction (`repartitionByRange` on the event time ⇒ slice i's
  * max ≤ slice i+1's min; mod-time order = slice order), which is
  * what a partitioned log tail (Kafka per-partition order, hourly
  * object-store drops) provides in production.
  *
  * Env: SPARK_GRAFT_SF_DIR (base, default sf0.1),
  * SPARK_GRAFT_SCALE_COPIES (default 10), SPARK_GRAFT_STREAM_STAGE
  * (default /tmp/graft_stream_stage), SPARK_GRAFT_STREAM_FILES
  * (slices, default 48), SPARK_GRAFT_STREAM_FPT (maxFilesPerTrigger,
  * default 4), SPARK_GRAFT_STREAM_OUT (json, default
  * /root/repo/bench_stream_scale.json). `--rebuild` re-stages.
  */
object StreamScaleBench {

  val Stages = Seq("view", "click", "purchase")

  private val schema = StructType(Seq(
    StructField("caseId", LongType), StructField("activity", StringType),
    StructField("tsMicros", LongType)))

  /** Inflate events ×copies (ScaleBench's key-offset scheme: trace
    * bodies preserved, case space grows) and write time-ordered
    * slices with ascending mod times. */
  def stage(spark: SparkSession, src: String, dir: String, copies: Int,
      files: Int): Unit = {
    val ev = Tables(spark, src, "events")
      .select(col("user_id").as("caseId"), col("event_type").as("activity"),
        unix_micros(col("ts")).as("tsMicros"))
    val inflated = (0 until copies).map { i =>
      ev.withColumn("caseId", col("caseId") + lit(i.toLong * 100000000L))
    }.reduce(_ unionAll _)
    val data = s"$dir/data"
    inflated.repartitionByRange(files, col("tsMicros"))
      .sortWithinPartitions("tsMicros")
      .write.mode("overwrite").parquet(data)
    // slice order = partition index order = event-time order; encode it
    // in ascending mod times (the file source processes oldest-first)
    val parts = new File(data).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val t0 = System.currentTimeMillis() - parts.length * 2000L - 60000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }
  }

  private def maxDataTs(spark: SparkSession, dir: String): Long =
    spark.read.schema(schema).parquet(s"$dir/data")
      .filter(col("caseId") >= 0L)
      .agg(max("tsMicros")).head().getLong(0)

  /** Append a one-row sentinel slice (new file ⇒ new micro-batch). */
  private def sentinel(spark: SparkSession, dir: String, tsMicros: Long): Unit = {
    import spark.implicits._
    Seq((-1L, "_s", tsMicros)).toDF("caseId", "activity", "tsMicros")
      .coalesce(1).write.mode("append").parquet(s"$dir/data")
  }

  private def stream(spark: SparkSession, dir: String, fpt: Int): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", fpt)
      .parquet(s"$dir/data")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")

  /** Runs a streaming query built by `mk` over the staged slices with
    * a foreachBatch fold, fires the final timers with two sentinel
    * slices, and returns (folded rows, batches, peak state rows,
    * seconds). `fold` maps each micro-batch output to a SMALL
    * DataFrame; only its collected rows cross to the driver.
    * Sentinel 1 sits one day PAST max(last event + gap) so every
    * real case's timeout is behind the watermark it sets; the
    * timers then fire in sentinel 2's batch (timeouts are checked
    * against the watermark computed from PRIOR batches). Sentinel
    * files are deleted afterwards so the staged dir stays pristine
    * for the next operator. */
  private def run(spark: SparkSession, dir: String, fpt: Int,
      maxTs: Long, gapDays: Long)(
      mk: DataFrame => DataFrame)(fold: DataFrame => DataFrame):
      (Seq[Row], Long, Long, Double) = {
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val before = new File(s"$dir/data").listFiles().map(_.getName).toSet
    val t0 = System.nanoTime()
    val foldFn: (DataFrame, Long) => Unit = { (df, _) =>
      batches.incrementAndGet()
      fold(df).collect().foreach(acc.add)
    }
    val q: StreamingQuery = mk(stream(spark, dir, fpt)).writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch(foldFn).start()
    try {
      q.processAllAvailable()
      sentinel(spark, dir, maxTs + (gapDays + 1L) * 86400L * 1000000L)
      q.processAllAvailable()
      sentinel(spark, dir, maxTs + 2L * (gapDays + 1L) * 86400L * 1000000L)
      q.processAllAvailable()
      val peak = q.recentProgress.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal)) match {
        case a if a.nonEmpty => a.max
        case _ => 0L
      }
      (acc.toArray(Array.empty[Row]).toSeq, batches.get(), peak,
        (System.nanoTime() - t0) / 1e9)
    } finally {
      q.stop()
      new File(s"$dir/data").listFiles()
        .filter(f => !before.contains(f.getName)).foreach(_.delete())
    }
  }

  /** Whole-history gap: longer than the data span, so a case's funnel /
    * trace state merges its entire history before the final flush —
    * the semantics the batch comparators compute. Drift uses day
    * windows and evicts mid-stream regardless. */
  val GapDays = 45L

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_STREAM_STAGE", "/tmp/graft_stream_stage")
    val files = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "48").toInt
    val fpt = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "4").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "/root/repo/bench_stream_scale.json")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    GraftSession.quietWindowWarnings()
    import spark.implicits._

    if (!new File(s"$dir/data").exists() || args.contains("--rebuild")) {
      println(s"staging $base x$copies -> $dir ($files slices)")
      val d = new File(s"$dir/data")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
      stage(spark, base, dir, copies, files)
    }
    val maxTs = maxDataTs(spark, dir)
    val batchEv = spark.read.schema(schema).parquet(s"$dir/data")
      .filter(col("caseId") >= 0L)

    val gapSeconds = GapDays * 86400L
    val results = scala.collection.mutable.ArrayBuffer[String]()

    // ---- funnel: per-case keyed state, final timer flush ----
    {
      val (rows, nb, peak, secs) = run(spark, dir, fpt, maxTs, GapDays) { df =>
        StreamingFunnel.reached(spark,
          df.as[StreamingFunnel.InEvent], Stages, gapSeconds).toDF()
      } { batch =>
        batch.filter(col("caseId") >= 0L)
          .groupBy(col("reachedIdx")).agg(count(lit(1)).as("n"))
      }
      val byIdx = rows.map(r => r.getInt(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val streamCounts = Stages.indices.map(i =>
        byIdx.collect { case (idx, n) if idx >= i => n }.sum)
      val t0 = System.nanoTime()
      val batchCounts = graft.ops.Funnel.orderedStages(
          batchEv.withColumn("ts", timestamp_micros(col("tsMicros"))),
          caseCol = "caseId", tsCol = "ts",
          stages = Stages.map(s => s -> (col("activity") === s)))
        .orderBy("stage_idx").select("n_cases").as[Long].collect().toSeq
      val bSecs = (System.nanoTime() - t0) / 1e9
      val ok = streamCounts == batchCounts
      println(f"funnel  x$copies stream=$secs%6.1fs batch=$bSecs%6.1fs batches=$nb peakState=$peak match=$ok $streamCounts vs $batchCounts")
      results += s""""funnel":{"stream_s":$secs,"batch_s":$bSecs,"batches":$nb,"peak_state_rows":$peak,"match":$ok}"""
    }

    // ---- dfg: trace assembly -> edge emission, folded per batch ----
    {
      val (rows, nb, peak, secs) = run(spark, dir, fpt, maxTs, GapDays) { df =>
        StreamingDfg.edges(spark,
          df.select(col("caseId").cast("string").as("caseId"),
            col("activity"), col("tsMicros"), col("ts"))
            .as[TraceAssembly.InEvent], gapSeconds).toDF()
      } { batch =>
        batch.filter(col("actFrom") =!= "_s" && col("actTo") =!= "_s")
          .groupBy(col("actFrom"), col("actTo")).agg(count(lit(1)).as("n"))
      }
      val streamEdges = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val t0 = System.nanoTime()
      val w = Window.partitionBy(col("caseId")).orderBy(col("tsMicros"), col("activity"))
      val batchEdges = batchEv
        .withColumn("_next", lead(col("activity"), 1).over(w))
        .filter(col("_next").isNotNull)
        .groupBy(col("activity").as("a"), col("_next").as("b"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .map { case (a, b, n) => (a, b) -> n }.toMap
      val bSecs = (System.nanoTime() - t0) / 1e9
      val ok = streamEdges == batchEdges
      println(f"dfg     x$copies stream=$secs%6.1fs batch=$bSecs%6.1fs batches=$nb peakState=$peak match=$ok (${streamEdges.size} edges)")
      results += s""""dfg":{"stream_s":$secs,"batch_s":$bSecs,"batches":$nb,"peak_state_rows":$peak,"match":$ok}"""
    }

    // ---- drift: tumbling day windows, MID-STREAM eviction ----
    {
      val baseline = batchEv.groupBy(col("activity")).count()
        .as[(String, Long)].collect().toMap
      val (rows, nb, peak, secs) = run(spark, dir, fpt, maxTs, GapDays) { df =>
        StreamingDrift.monitor(spark,
          df.select(col("activity"), col("tsMicros"), col("ts"))
            .as[StreamingDrift.InEvent], 86400L, baseline).toDF()
      } { batch => batch } // already window-rows (≤ span/1d of them)
      val streamWins = rows.filter(_.getLong(0) <= maxTs)
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val t0 = System.nanoTime()
      val g = baseline.values.sum
      val winUs = 86400L * 1000000L
      val perWin = batchEv
        .groupBy(expr(s"(tsMicros div $winUs) * $winUs").as("ws"),
          col("activity"))
        .agg(count(lit(1)).as("n_pa"))
        .as[(Long, String, Long)].collect()
        .groupBy(_._1)
      val batchWins = perWin.map { case (ws, as) =>
        val m = as.map(a => a._2 -> a._3).toMap
        val nP = m.values.sum
        val acts = m.keySet ++ baseline.keySet
        val num = acts.iterator.map(a =>
          math.abs(m.getOrElse(a, 0L) * g - baseline.getOrElse(a, 0L) * nP)).sum
        (ws, nP, if (nP == 0 || g == 0) 0.0 else num.toDouble / (nP.toDouble * g.toDouble))
      }.toSeq.sortBy(_._1)
      val bSecs = (System.nanoTime() - t0) / 1e9
      val ok = streamWins == batchWins
      println(f"drift   x$copies stream=$secs%6.1fs batch=$bSecs%6.1fs batches=$nb peakState=$peak match=$ok (${streamWins.size} windows)")
      results += s""""drift":{"stream_s":$secs,"batch_s":$bSecs,"batches":$nb,"peak_state_rows":$peak,"match":$ok}"""
    }

    // ---- throttle: one-timestamp state, CONTINUOUS mid-stream
    // eviction (timeout = last event + gap, far shorter than the data
    // span — peak state tracks keys active within the gap horizon,
    // not the key universe) ----
    {
      val thGap = 600L
      val (rows, nb, peak, secs) = run(spark, dir, fpt, maxTs, GapDays) { df =>
        StreamingThrottle.keptCounts(spark,
          df.select(col("caseId"), col("activity").as("label"),
            col("tsMicros"), col("tsMicros").as("tie"), col("ts"))
            .as[StreamingThrottle.InEvent], thGap).toDF()
      } { batch =>
        batch.filter(col("label") =!= "_s")
          .groupBy(col("label"))
          .agg(sum(col("nTotal")).as("t"), sum(col("nKept")).as("k"))
      }
      val streamCounts = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (l, v) =>
          l -> (v.map(_._2._1).sum, v.map(_._2._2).sum) }
      val t0 = System.nanoTime()
      // batch truth: the same lag-relative rule (tie = tsMicros — equal
      // timestamps within a key are order-indifferent for counting:
      // a zero gap drops the later one under either ordering)
      val w = Window.partitionBy(col("caseId"), col("activity"))
        .orderBy(col("tsMicros"))
      val batchCounts = batchEv
        .withColumn("_prev", lag(col("tsMicros"), 1).over(w))
        .withColumn("_kept", col("_prev").isNull ||
          col("tsMicros") - col("_prev") > thGap * 1000000L)
        .groupBy(col("activity"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("_kept"), 1L).otherwise(0L)).as("k"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val bSecs = (System.nanoTime() - t0) / 1e9
      val ok = streamCounts == batchCounts
      println(f"throttle x$copies stream=$secs%6.1fs batch=$bSecs%6.1fs batches=$nb peakState=$peak match=$ok (${streamCounts.size} labels)")
      results += s""""throttle":{"stream_s":$secs,"batch_s":$bSecs,"batches":$nb,"peak_state_rows":$peak,"match":$ok}"""
    }

    // ---- exactly-once dedup: every slice DUPLICATED as a sibling
    // file with the next mod-time (the at-least-once redelivery
    // failure mode), so original and copy land in the same or the
    // immediately following trigger — inside the watermark horizon,
    // where dropDuplicatesWithinWatermark guarantees the drop. The
    // per-type counts after online dedup must equal the single-copy
    // batch counts exactly. ----
    {
      // batch truth MATERIALIZED before the dup files exist (batchEv
      // is lazy — evaluating it later would scan the duplicates too).
      // The dedup key (caseId, activity, tsMicros) is unique in the
      // single-copy data (verified: 100k distinct of 100k at sf0.1;
      // per-copy key offsets preserve it at any inflation), so plain
      // counts ARE the post-dedup truth.
      val batchCounts = batchEv.groupBy(col("activity"))
        .agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val data = new File(s"$dir/data")
      val originals = data.listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.lastModified())
      val dups = originals.map { f =>
        val d = new File(data, f.getName.replace("part-", "dup-part-"))
        java.nio.file.Files.copy(f.toPath, d.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        d.setLastModified(f.lastModified() + 1L)
        d
      }
      try {
        val (rows, nb, peak, secs) = run(spark, dir, fpt, maxTs, GapDays) { df =>
          df.dropDuplicatesWithinWatermark("caseId", "activity", "tsMicros")
        } { batch =>
          batch.filter(col("caseId") >= 0L)
            .groupBy(col("activity")).agg(count(lit(1)).as("n"))
        }
        val streamCounts = rows.map(r => r.getString(0) -> r.getLong(1))
          .groupBy(_._1).map { case (a, v) => a -> v.map(_._2).sum }
        val ok = streamCounts == batchCounts
        println(f"dedup   x$copies stream=$secs%6.1fs batches=$nb peakState=$peak match=$ok (${streamCounts.size} labels)")
        results += s""""dedup":{"stream_s":$secs,"batches":$nb,"peak_state_rows":$peak,"match":$ok}"""
      } finally dups.foreach(_.delete())
    }

    val line = s"""{"metric":"stream_scale","copies":$copies,"files":$files,"fpt":$fpt,"base":"$base","ops":${results.mkString("{", ",", "}")}}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
