package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{GraftSession, Tables}

/** Scratch phase profiler for the MemoryStream parity floor (dev
  * tool): times feed / start / processAllAvailable / second batch /
  * stop separately for a representative stateful parity query.
  * HISTORICAL (≤ r12): the graded gates feed from the tmpfs drop-dir
  * file source since r13 (queries/ParityFeed.withFeed); this probe
  * pins the old harness's floor decomposition for the record. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("32")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables(spark, dir, "region").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "8")
    val ckBase = sys.env.getOrElse("SPARK_GRAFT_PROBE_CKPT", "/dev/shm")
    (1 to 3).foreach { i =>
      println(s"--- run $i (parts=$parts ckpt=$ckBase)")
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      try {
        val ev = Tables(spark, dir, "events")
        val batchDs = ev.select(col("event_type"), unix_micros(col("ts")))
          .as[(String, Long)]
        val baseline = t("baseline-collect") {
          ev.groupBy(col("event_type")).count().as[(String, Long)].collect().toMap
        }
        val input = MemoryStream[(String, Long)]
        val maxTs = t("feed") {
          import scala.jdk.CollectionConverters._
          var mx = Long.MinValue
          batchDs.coalesce(4).toLocalIterator().asScala.grouped(100000).foreach { c =>
            c.foreach(e => if (e._2 > mx) mx = e._2)
            input.addData(c)
          }
          mx
        }
        input.addData(("_sentinel", maxTs + 86400L * 1000000L))
        val events = input.toDS().toDF("activity", "tsMicros")
          .withColumn("ts", timestamp_micros(col("tsMicros")))
          .withWatermark("ts", "10 seconds")
          .as[graft.streaming.StreamingDrift.InEvent]
        val ckpt = s"$ckBase/graft_ckpt_probe_$i"
        val q = t("start") {
          graft.streaming.StreamingDrift.monitor(spark, events, 86400L, baseline)
            .writeStream.format("memory").queryName(s"probe_$i")
            .option("checkpointLocation", ckpt)
            .outputMode(OutputMode.Append()).start()
        }
        t("batch1") { q.processAllAvailable() }
        input.addData(("_sentinel", maxTs + 2L * 86400L * 1000000L))
        t("batch2") { q.processAllAvailable() }
        t("stop") { q.stop() }
        t("read-table") { spark.table(s"probe_$i").count() }
        spark.catalog.dropTempView(s"probe_$i")
        t("rm-ckpt") {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(ckpt))
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    spark.stop()
  }
}
