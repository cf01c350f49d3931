package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.Declare

/** Streaming DECLARE monitor: per-closed-trace checks, plus a
  * cross-check that the pure evaluator agrees with the batch miner's
  * support fractions on the same log. */
class StreamingDeclareSpec extends SparkSpec {

  import spark.implicits._

  private def sec(s: Long): Long = s * 1000000L

  test("monitor flags violations on closed traces only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TraceAssembly.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[TraceAssembly.InEvent]

    val checks = StreamingDeclare.monitor(spark, events, gapSeconds = 30,
      Seq(StreamingDeclare.Constraint("response", "a", "b"),
        StreamingDeclare.Constraint("absence2", "a"),
        StreamingDeclare.Constraint("init", "a")))
    val query = checks.writeStream
      .format("memory").queryName("declare_checks")
      .outputMode(OutputMode.Append()).start()
    try {
      // case GOOD: a then b (response ok); case BAD: b then a a
      // (response(a,b) violated — no b after last a; absence2 violated).
      input.addData(
        TraceAssembly.InEvent("GOOD", "a", sec(10)),
        TraceAssembly.InEvent("GOOD", "b", sec(11)),
        TraceAssembly.InEvent("BAD", "b", sec(10)),
        TraceAssembly.InEvent("BAD", "a", sec(12)),
        TraceAssembly.InEvent("BAD", "a", sec(13)))
      query.processAllAvailable()
      input.addData(TraceAssembly.InEvent("X", "x", sec(200)))
      query.processAllAvailable()
      input.addData(TraceAssembly.InEvent("X", "x", sec(201)))
      query.processAllAvailable()

      val out = spark.table("declare_checks")
        .as[StreamingDeclare.TraceCheck].collect()
        .map(c => (c.caseId, c.template) -> ((c.applicable, c.satisfied)))
        .toMap
      assert(out((("GOOD", "response"))) == ((true, true)))
      assert(out((("GOOD", "absence2"))) == ((true, true)))
      assert(out((("GOOD", "init"))) == ((true, true)))
      assert(out((("BAD", "response"))) == ((true, false)))
      assert(out((("BAD", "absence2"))) == ((true, false)))
      assert(out((("BAD", "init"))) == ((true, false)))
      // open case X emits nothing
      assert(!out.keys.exists(_._1 == "X"))
    } finally query.stop()
  }

  test("pure evaluator agrees with the batch miner on every template") {
    // Same three-case log as DeclareSpec: A B C | A A B | B C.
    val traces = Map(
      1L -> Seq("A", "B", "C"), 2L -> Seq("A", "A", "B"),
      3L -> Seq("B", "C"))
    val df = traces.toSeq.flatMap { case (c, acts) =>
      acts.zipWithIndex.map { case (a, i) =>
        (c, a, new Timestamp(i * 1000L), c * 10 + i)
      }
    }.toDF("case_id", "activity", "ts", "event_id")

    val batch = Declare.constraints(df, "case_id", "activity", "ts", "event_id")
      .as[(String, String, String, Long, Long, Double)].collect()

    batch.foreach { case (tpl, a, b, nApp, nSat, _) =>
      val evals = traces.values.toSeq
        .map(acts => StreamingDeclare.evaluate(
          StreamingDeclare.Constraint(tpl, a, b), acts))
      val nAppEval = evals.count(_._1)
      val nSatEval = evals.count(e => e._1 && e._2)
      assert(nAppEval.toLong == nApp && nSatEval.toLong == nSat,
        s"$tpl($a,$b): batch ($nApp,$nSat) vs evaluator ($nAppEval,$nSatEval)")
    }
  }

  test("compact profile state folds across >=3 watermark advances, tie group at a cut") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TraceAssembly.InEvent]
    val events = input.toDS()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[TraceAssembly.InEvent]
    // every template, including order-sensitive ones whose verdicts
    // hinge on first/last positions folded piecewise
    val cons = Seq(
      StreamingDeclare.Constraint("existence", "a"),
      StreamingDeclare.Constraint("absence2", "b"),
      StreamingDeclare.Constraint("init", "a"),
      StreamingDeclare.Constraint("last", "e"),
      StreamingDeclare.Constraint("responded_existence", "c", "e"),
      StreamingDeclare.Constraint("response", "a", "b"),
      StreamingDeclare.Constraint("precedence", "a", "d"),
      StreamingDeclare.Constraint("succession", "a", "e"))
    val query = StreamingDeclare.monitor(spark, events, gapSeconds = 3600, cons)
      .writeStream.format("memory").queryName("declare_fold")
      .outputMode(OutputMode.Append()).start()
    try {
      def add(evs: TraceAssembly.InEvent*): Unit = {
        input.addData(evs: _*); query.processAllAvailable()
      }
      // same shape as the conformance fold spec: the (b,c) tie group
      // sits exactly at the 120 cut, T folds in three slices + close
      add(TraceAssembly.InEvent("T", "a", sec(100)),
        TraceAssembly.InEvent("T", "c", sec(120)),
        TraceAssembly.InEvent("T", "b", sec(120)),
        TraceAssembly.InEvent("W", "x", sec(130)))   // wm -> 120: AT the tie
      add(TraceAssembly.InEvent("T", "d", sec(155)),
        TraceAssembly.InEvent("W", "x", sec(160)))   // folds {a}, tie held; wm -> 150
      add(TraceAssembly.InEvent("T", "e", sec(190)),
        TraceAssembly.InEvent("W", "x", sec(195)))   // folds {b,c} whole; wm -> 185
      add(TraceAssembly.InEvent("F", "_s", sec(7200)))
      add(TraceAssembly.InEvent("F2", "_s", sec(14400)))

      val out = spark.table("declare_fold")
        .as[StreamingDeclare.TraceCheck].collect()
        .filter(_.caseId == "T")
        .map(c => c.template -> ((c.applicable, c.satisfied))).toMap
      assert(out.size == cons.size)
      // ground truth: the pure evaluator over the fully sorted trace
      val acts = Seq("a", "b", "c", "d", "e")
      cons.foreach { c =>
        assert(out(c.template) == StreamingDeclare.evaluate(c, acts),
          s"${c.template}(${c.actA},${c.actB}): " +
            s"streamed ${out(c.template)} vs batch " +
            s"${StreamingDeclare.evaluate(c, acts)}")
      }
    } finally query.stop()
    spark.catalog.dropTempView("declare_fold")
  }
}
