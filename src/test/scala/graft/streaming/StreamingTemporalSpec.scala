package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Online transition-pair emission: batch parity under out-of-order
  * arrival + the incremental-emission property (pairs surface while
  * the case is still open). Timestamps stay well above epoch 0 — the
  * initial watermark sits AT 0 and Spark's pre-operator late filter
  * drops rows that collide with it. */
class StreamingTemporalSpec extends SparkSpec {

  import spark.implicits._

  def sec(s: Long): Long = s * 1000000L

  test("streamed pairs == batch transition delays, emitted before case close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TraceAssembly.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[TraceAssembly.InEvent]
    val query = StreamingTemporal.pairs(spark, events, gapSeconds = 3600)
      .writeStream.format("memory").queryName("stream_tp")
      .outputMode(OutputMode.Append()).start()
    try {
      val all = scala.collection.mutable.ListBuffer[TraceAssembly.InEvent]()
      def add(evs: TraceAssembly.InEvent*): Unit = {
        all ++= evs; input.addData(evs: _*); query.processAllAvailable()
      }
      // out-of-order within the first batch; the wm then advances
      // THROUGH the open trace across batches
      add(TraceAssembly.InEvent("T", "b", sec(120)),
        TraceAssembly.InEvent("T", "a", sec(110)),
        TraceAssembly.InEvent("U", "x", sec(115)))      // wm -> 110
      add(TraceAssembly.InEvent("T", "c", sec(140)),
        TraceAssembly.InEvent("U", "y", sec(145)))      // wm -> 135
      // a fold-triggering batch for T: during it the wm (135) is past
      // a@110 and b@120, so a->b finalizes and emits NOW — while T is
      // still open (gap 3600 never expires in this test until flush)
      add(TraceAssembly.InEvent("T", "d", sec(150)),
        TraceAssembly.InEvent("T", "e", sec(150)))      // tie at 150
      val early = spark.table("stream_tp")
        .as[(String, String, String, Long)].collect()
      assert(early.contains(("T", "a", "b", sec(10))),
        s"expected a->b before case close, got ${early.toSeq}")
      // flush: two far-future sentinels (timers fire vs prior wm)
      add(TraceAssembly.InEvent("F", "_s", sec(7200)))
      add(TraceAssembly.InEvent("F2", "_s", sec(14400)))
      val streamed = spark.table("stream_tp")
        .as[(String, String, String, Long)].collect().toSeq
        .filter(p => p._2 != "_s" && p._3 != "_s")
        .groupBy(identity).view.mapValues(_.length).toMap
      // batch truth on the same events, tie-break = activity (the
      // stream fold's (ts, activity) sort)
      val batch = all.toSeq.map(e => (e.caseId, e.activity, e.tsMicros))
        .toDF("case", "act", "t")
        .withColumn("ts", timestamp_micros(col("t")))
      val expect = graft.ops.Dfg
        .transitionDelays(batch, "case", "act", "ts", "act")
        .as[(String, String, Long)].collect().toSeq
        .filter(p => p._1 != "_s" && p._2 != "_s")
        .groupBy(identity).view.mapValues(_.length).toMap
      // streamed pairs carry caseId; project it away for the multiset
      val streamedNoCase = streamed.toSeq
        .map { case ((_, f, t, w), n) => ((f, t, w), n) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(streamedNoCase == expect,
        s"streamed=$streamedNoCase expect=$expect")
      // each pair exactly once, never duplicated across fold steps
      assert(streamed.values.forall(_ == 1))
      assert(expect(("d", "e", 0L)) == 1) // the tie pair is present
    } finally query.stop()
    spark.catalog.dropTempView("stream_tp")
  }

  test("deviation filter composes: streamed pairs x batch profile == batch deviations") {
    implicit val sqlCtx = spark.sqlContext
    // one tight segment with a planted outlier, like TemporalSpec
    val data = (0 until 9).flatMap(i => Seq(
      TraceAssembly.InEvent(s"t$i", "p", sec(100)),
      TraceAssembly.InEvent(s"t$i", "q", sec(110)))) ++
      Seq(TraceAssembly.InEvent("t9", "p", sec(100)),
        TraceAssembly.InEvent("t9", "q", sec(10100)))
    val input = MemoryStream[TraceAssembly.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[TraceAssembly.InEvent]
    val query = StreamingTemporal.pairs(spark, events, gapSeconds = 30)
      .writeStream.format("memory").queryName("stream_tp_dev")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(data: _*)
      query.processAllAvailable()
      input.addData(TraceAssembly.InEvent("F", "_s", sec(100000)))
      query.processAllAvailable()
      input.addData(TraceAssembly.InEvent("F2", "_s", sec(200000)))
      query.processAllAvailable()
      val pairs = spark.table("stream_tp_dev")
        .filter(col("actFrom") =!= "_s" && col("actTo") =!= "_s")
        .select(col("actFrom").as("act_from"), col("actTo").as("act_to"),
          expr("waitUs div 1000000").as("wait_s"))
      val prof = graft.ops.Temporal.profileOf(pairs)
      val dev = graft.ops.Temporal.deviationFlags(pairs, prof, zeta = 2.0)
        .groupBy("act_from", "act_to")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_dev"), 1L).otherwise(0L)).as("n_dev"))
        .as[(String, String, Long, Long)].collect().toSeq
      assert(dev == Seq(("p", "q", 10L, 1L))) // exactly the planted outlier
    } finally query.stop()
    spark.catalog.dropTempView("stream_tp_dev")
  }
}
