package graft.tools

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.GraftSession

/** Throwaway probe: which hopping windows does the file-source stream
  * miss vs batch? (StreamScaleBench hopping row debug) */
object ProbeHop {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_STREAM_STAGE", "/tmp/graft_stream_x10")
    val spark = GraftSession.get("32")
    GraftSession.quietWindowWarnings()
    val sch = StructType(Seq(
      StructField("caseId", LongType), StructField("activity", StringType),
      StructField("tsMicros", LongType)))
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val before = new File(s"$dir/data").listFiles().map(_.getName).toSet
    val src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 4)
      .parquet(s"$dir/data")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
    val agg = src.filter(col("activity") =!= "_s")
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("activity"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws"), col("activity"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.collect()
        println(s"[probe] batch $id emitted ${rows.length}")
        rows.foreach(r => acc.add((r.getLong(0), r.getString(1), r.getLong(2))))
      }.start()
    val maxTs = spark.read.schema(sch).parquet(s"$dir/data")
      .filter(col("caseId") >= 0L).agg(max("tsMicros")).head().getLong(0)
    import spark.implicits._
    try {
      q.processAllAvailable()
      Seq((-1L, "_s", maxTs + 46L * 86400L * 1000000L))
        .toDF("caseId", "activity", "tsMicros")
        .coalesce(1).write.mode("append").parquet(s"$dir/data")
      q.processAllAvailable()
      Seq((-1L, "_s", maxTs + 92L * 86400L * 1000000L))
        .toDF("caseId", "activity", "tsMicros")
        .coalesce(1).write.mode("append").parquet(s"$dir/data")
      q.processAllAvailable()
    } finally {
      q.stop()
      new File(s"$dir/data").listFiles()
        .filter(f => !before.contains(f.getName)).foreach(_.delete())
    }
    val got = acc.toArray(Array.empty[(Long, String, Long)]).toSeq
    val batch = spark.read.schema(sch).parquet(s"$dir/data")
      .filter(col("caseId") >= 0L)
      .select(col("activity"), col("tsMicros"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("ws", (col("tsMicros") - col("tsMicros") % 21600000000L) -
        col("k") * 21600000000L)
      .groupBy(col("ws"), col("activity")).agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSeq
    val gotSet = got.toSet
    val batchSet = batch.toSet
    println(s"[probe] stream=${got.size} batch=${batch.size}")
    val missing = (batchSet -- gotSet).toSeq.sortBy(t => (t._1, t._2))
    val extra = (gotSet -- batchSet).toSeq.sortBy(t => (t._1, t._2))
    println(s"[probe] missing=${missing.size} extra=${extra.size}")
    missing.take(25).foreach(m => println(s"[probe] MISSING $m"))
    extra.take(25).foreach(m => println(s"[probe] EXTRA   $m"))
    val dataMin = spark.read.schema(sch).parquet(s"$dir/data")
      .filter(col("caseId") >= 0L).agg(min("tsMicros")).head().getLong(0)
    println(s"[probe] data min=$dataMin max=$maxTs")
    spark.stop()
  }
}
