package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{GraftSession, Tables}
import graft.streaming.StreamingHeavyHitters
import graft.text.TextOps

/** Scratch phase-timing probe for q_stream_heavy_hitters_parity —
  * HISTORICAL (r12): probes the old MemoryStream harness shapes (the
  * single-block explode and its repartition fix). The graded gate
  * feeds from the tmpfs drop-dir file source since r13
  * (queries/ParityFeed.withFeed) and no longer has these shapes. */
object ProbeHh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("32")
    GraftSession.quietWindowWarnings()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hh] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val Ignore = " "
      val docsDs = Tables(spark, dir, "documents")
        .select(col("text"),
          ((col("doc_id").cast("long") + 1L) * 1000000L).as("tsMicros"))
        .as[(String, Long)]
      val input = MemoryStream[(String, Long)]
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val maxTs = time("feed") {
        var mx = Long.MinValue
        docsDs.coalesce(4).toLocalIterator().forEachRemaining { t =>
          if (t._2 > mx) mx = t._2
          buf += t
          if (buf.size >= 100000) { input.addData(buf.toSeq); buf.clear() }
        }
        if (buf.nonEmpty) { input.addData(buf.toSeq); buf.clear() }
        mx
      }
      input.addData(("s s s", maxTs + 86400L * 1000000L))
      val items = input.toDS().repartition(32).toDF("text", "tsMicros")
        .select(explode(TextOps.shinglesOf(TextOps.tokens(col("text")), 3))
          .as("gram"), col("tsMicros"))
        .select(when(col("tsMicros") > lit(maxTs), lit(Ignore))
          .otherwise(col("gram")).as("item"), col("tsMicros"))
        .as[StreamingHeavyHitters.Item]
      val q = StreamingHeavyHitters.candidates(spark, items, k = 1 << 14,
          nBuckets = 8, ppm = 75, gapSeconds = 3600L, ignoreItem = Ignore)
        .writeStream.format("memory").queryName(s"hh_probe_$round")
        .outputMode(OutputMode.Append()).start()
      time("pass1 sketch") {
        q.processAllAvailable()
        input.addData(("s s s", maxTs + 2L * 86400L * 1000000L))
        q.processAllAvailable()
      }
      q.stop()
      val cands = time("cand collect") {
        spark.table(s"hh_probe_$round").select(col("item")).distinct()
          .as[String].collect()
      }
      println(s"[hh] n_cands=${cands.length}")
      val input2 = MemoryStream[(String, Long)]
      time("feed2") {
        docsDs.coalesce(4).toLocalIterator().forEachRemaining { t =>
          buf += t
          if (buf.size >= 100000) { input2.addData(buf.toSeq); buf.clear() }
        }
        if (buf.nonEmpty) { input2.addData(buf.toSeq); buf.clear() }
      }
      val rec = new StreamingHeavyHitters.ExactRecount(spark, cands, Ignore)
      val q2 = input2.toDS().repartition(32).toDF("text", "tsMicros")
        .select(explode(TextOps.shinglesOf(TextOps.tokens(col("text")), 3))
          .as("gram"), col("tsMicros"))
        .select(when(col("tsMicros") > lit(maxTs), lit(Ignore))
          .otherwise(col("gram")).as("item"), col("tsMicros"))
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) => rec.addBatch(df.toDF(), id))
        .queryName(s"hh_probe_rec_$round").start()
      time("pass2 recount") {
        try q2.processAllAvailable() finally q2.stop()
      }
      println(s"[hh] heavy=${rec.result(75).size}")
    }
  }
}
