package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SketchQuantiles.MpSketch

/** Munro–Paterson sketch: the deterministic rank-error bound must hold
  * on adversarially small buffers under heavy collapsing, any merge
  * order, and serialization round-trips — and the Spark operator +
  * audit must certify it end to end. */
class SketchQuantilesSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic LCG values (no Math.random in specs). */
  private def lcg(n: Int, seed: Long = 42L): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      // non-uniform on purpose: squash to a skewed small domain so
      // duplicate values exercise the tie paths
      math.floorMod(x >>> 33, 10000L)
    }
  }

  private def targetRank(n: Long, p: Int): Long =
    (n / 1000L) * p + ((n % 1000L) * p + 999L) / 1000L

  /** The gate's ok-inequality against a sorted copy. */
  private def rankOk(sorted: Array[Long], est: Long, target: Long,
      bound: Long): Boolean = {
    val lt = sorted.count(_ < est).toLong
    val le = sorted.count(_ <= est).toLong
    lt < target + bound && le >= target - bound
  }

  private val ps = Seq(1, 250, 500, 750, 900, 990, 1000)

  test("single sketch: every permille within the a-priori bound (k=64, heavy collapsing)") {
    for (n <- Seq(1, 63, 64, 65, 1000, 20000)) {
      val vs = lcg(n)
      val sk = new MpSketch(64)
      vs.foreach(sk.add)
      assert(sk.n == n.toLong)
      val sorted = vs.sorted
      val bound = SketchQuantiles.errBoundRank(n.toLong, 64)
      // the tracked collapse error must respect the proof's per-level cap
      assert(sk.trackedErrRank <= SketchQuantiles.levelsFor(n.toLong, 64)
        .toLong * n / (2L * 64) + 1L)
      ps.foreach { p =>
        val t = targetRank(n.toLong, p)
        assert(rankOk(sorted, sk.valueAtRank(t), t, bound),
          s"n=$n p=$p bound=$bound")
      }
    }
  }

  test("n <= k: the sketch is exact (no collapse ever ran)") {
    val vs = lcg(50)
    val sk = new MpSketch(64)
    vs.foreach(sk.add)
    assert(sk.trackedErrRank == 0L)
    val sorted = vs.sorted
    ps.foreach { p =>
      val t = targetRank(50L, p)
      assert(sk.valueAtRank(t) == sorted((t - 1).toInt))
    }
  }

  test("merge: uneven chunks, nested merge order, bound still holds") {
    val n = 30000
    val vs = lcg(n, seed = 7L)
    val chunkSizes = Seq(1, 17, 64, 500, 3000, 9000, n - 1 - 17 - 64 - 500 - 3000 - 9000)
    var off = 0
    val sketches = chunkSizes.map { c =>
      val sk = new MpSketch(64)
      vs.slice(off, off + c).foreach(sk.add)
      off += c
      sk
    }
    // fold pairs first, then the stragglers — an arbitrary tree
    val acc = new MpSketch(64)
    sketches.grouped(2).foreach { pair =>
      val m = new MpSketch(64)
      pair.foreach(m.mergeInPlace)
      acc.mergeInPlace(m)
    }
    assert(acc.n == n.toLong)
    val sorted = vs.sorted
    val bound = SketchQuantiles.errBoundRank(n.toLong, 64)
    ps.foreach { p =>
      val t = targetRank(n.toLong, p)
      assert(rankOk(sorted, acc.valueAtRank(t), t, bound), s"p=$p bound=$bound")
    }
  }

  test("serialization round-trip preserves the sketch exactly") {
    val sk = new MpSketch(64)
    lcg(5000, seed = 3L).foreach(sk.add)
    val back = MpSketch.fromLongs(sk.toLongs)
    assert(back.n == sk.n)
    assert(back.trackedErrRank == sk.trackedErrRank)
    (1L to sk.n by 97L).foreach { t =>
      assert(back.valueAtRank(t) == sk.valueAtRank(t))
    }
    // and the round-tripped sketch keeps FOLDING identically
    back.add(123L); sk.add(123L)
    assert(back.valueAtRank(1L) == sk.valueAtRank(1L))
  }

  test("errBoundRank: integer form matches the oracle's arithmetic") {
    assert(SketchQuantiles.levelsFor(1L, 4096) == 0)
    assert(SketchQuantiles.levelsFor(4096L, 4096) == 0)
    assert(SketchQuantiles.levelsFor(4097L, 4096) == 1)
    assert(SketchQuantiles.levelsFor(2400000L, 4096) == 10)
    assert(SketchQuantiles.errBoundRank(2400000L, 4096) ==
      (14L * 2400000L) / 8192L + 1L)
  }

  test("batch operator + rankAudit: all rows certified on a grouped frame") {
    val rows = lcg(9000, seed = 11L).zipWithIndex.map { case (v, i) =>
      (s"g${i % 3}", v)
    }.toSeq
    val df = rows.toDF("group", "v")
    val est = SketchQuantiles.approxByGroup(df, col("group"), col("v"),
      Seq(250, 500, 750, 990), k = 128)
    val audited = SketchQuantiles.rankAudit(df, col("group"), col("v"), est)
      .collect()
    assert(audited.length == 12) // 3 groups x 4 permilles
    audited.foreach { r =>
      assert(r.getAs[Boolean]("rank_ok"), r.toString)
      assert(r.getAs[Long]("n_total") == 3000L)
      assert(r.getAs[Long]("err_bound_rank") ==
        SketchQuantiles.errBoundRank(3000L, 128))
    }
  }

  /** Weighted brute force: the gate's ok-inequality against an
    * (value, weight) list, ranks by mass. */
  private def rankOkW(items: Array[(Long, Long)], est: Long, target: Long,
      bound: Long): Boolean = {
    val lt = items.collect { case (v, w) if v < est => w }.sum
    val le = items.collect { case (v, w) if v <= est => w }.sum
    lt < target + bound && le >= target - bound
  }

  test("weighted: addWeighted(v, 1) leaves the unit wire format untouched") {
    val a = new MpSketch(64); val b = new MpSketch(64)
    lcg(777, seed = 13L).foreach { v => a.add(v); b.addWeighted(v, 1L) }
    assert(java.util.Arrays.equals(a.toLongs, b.toLongs))
    assert(b.toLongs.head == 64L) // unit format, no extended marker
  }

  test("weighted: bound holds vs mass-expanded brute force, incl. heavy and power-of-two weights") {
    val vs = lcg(4000, seed = 21L)
    val ws = lcg(4000, seed = 22L).map(w => (w % 97L) + 1L) // 1..97: bits 0..6
      .zipWithIndex.map { case (w, i) =>
        if (i % 503 == 0) 1L << 17 // a few heavy single items
        else if (i % 101 == 0) 64L // exact power of two: only bit 6
        else w
      }
    val items = vs.zip(ws)
    val sk = new MpSketch(64)
    items.foreach { case (v, w) => sk.addWeighted(v, w) }
    val mass = ws.sum
    assert(sk.n == mass)
    val bound = SketchQuantiles.errBoundRank(mass, 64)
    assert(sk.trackedErrRank <= SketchQuantiles.levelsFor(mass, 64)
      .toLong * mass / (2L * 64) + 1L)
    ps.foreach { p =>
      val t = targetRank(mass, p)
      assert(rankOkW(items, sk.valueAtRank(t), t, bound),
        s"p=$p bound=$bound mass=$mass")
    }
  }

  test("weighted: merge folds fill partials; serialization round-trips the extended format") {
    val vs = lcg(3000, seed = 31L)
    val ws = lcg(3000, seed = 32L).map(w => (w % 1000L) + 1L)
    val items = vs.zip(ws)
    val chunks = items.grouped(700).toSeq
    val sketches = chunks.map { c =>
      val sk = new MpSketch(64)
      c.foreach { case (v, w) => sk.addWeighted(v, w) }
      // round-trip EVERY partial through the wire format, as the
      // operator does between map and reduce sides
      MpSketch.fromLongs(sk.toLongs)
    }
    assert(sketches.exists(_.toLongs.head == -64L)) // extended marker in play
    val acc = new MpSketch(64)
    sketches.foreach(acc.mergeInPlace)
    val mass = ws.sum
    assert(acc.n == mass)
    val back = MpSketch.fromLongs(acc.toLongs)
    assert(back.n == acc.n && back.trackedErrRank == acc.trackedErrRank)
    val bound = SketchQuantiles.errBoundRank(mass, 64)
    ps.foreach { p =>
      val t = targetRank(mass, p)
      assert(back.valueAtRank(t) == acc.valueAtRank(t))
      assert(rankOkW(items, acc.valueAtRank(t), t, bound), s"p=$p bound=$bound")
    }
  }

  test("weighted operator + rankAuditWeighted: all rows certified, mass totals exact") {
    val rows = lcg(6000, seed = 41L).zip(lcg(6000, seed = 42L)).zipWithIndex
      .map { case ((v, w), i) => (s"g${i % 3}", v, (w % 50L) + 1L) }.toSeq
    val df = rows.toDF("group", "v", "w")
    val est = SketchQuantiles.approxByGroupWeighted(df, col("group"),
      col("v"), col("w"), Seq(250, 500, 750, 990), k = 128)
    val audited = SketchQuantiles.rankAuditWeighted(df, col("group"),
      col("v"), col("w"), est).collect()
    assert(audited.length == 12)
    val massByGroup = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).sum }
    audited.foreach { r =>
      val g = r.getAs[String]("group")
      assert(r.getAs[Boolean]("rank_ok"), r.toString)
      assert(r.getAs[Long]("n_total") == massByGroup(g))
      assert(r.getAs[Long]("err_bound_rank") ==
        SketchQuantiles.errBoundRank(massByGroup(g), 128))
    }
  }

  test("rankAuditWeighted rejects weights outside the addWeighted contract") {
    // addWeighted requires w >= 1; a weight expression that yields 0,
    // negative, or null mass must fail the AUDIT loudly — silently
    // summing it would certify against a different mass definition
    // than the sketch ingested.
    val est = SketchQuantiles.approxByGroupWeighted(
      Seq(("g", 1L, 2L), ("g", 5L, 3L)).toDF("group", "v", "w"),
      col("group"), col("v"), col("w"), Seq(500), k = 64)
    Seq(Seq(("g", 1L, 0L)), Seq(("g", 1L, -4L))).foreach { bad =>
      val ex = intercept[Exception] {
        SketchQuantiles.rankAuditWeighted(bad.toDF("group", "v", "w"),
          col("group"), col("v"), col("w"), est).collect()
      }
      assert(ex.getMessage.contains("weight must be"), ex.getMessage)
    }
    val exNull = intercept[Exception] {
      SketchQuantiles.rankAuditWeighted(
        Seq(("g", 1L, Option.empty[Long])).toDF("group", "v", "w"),
        col("group"), col("v"), col("w"), est).collect()
    }
    assert(exNull.getMessage.contains("weight must be"), exNull.getMessage)
  }

  test("streaming twin: one-pass fold across micro-batches, certified within bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.{StreamingSketchQuantiles, StreamingWinsorized}
    implicit val sqlCtx = spark.sqlContext
    val Ignore = "\u0000ignore"
    val vs = lcg(6000, seed = 5L)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      (s"g${i % 2}", v, (i + 1).toLong * 1000000L)
    }
    val maxTs = rows.map(_._3).max
    val input = MemoryStream[(String, Long, Long)]
    val items = input.toDS().toDF("group", "v", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingWinsorized.VItem]
    val q = StreamingSketchQuantiles.quantiles(spark, items, k = 128,
        psPermille = Seq(500, 990), gapSeconds = 60L, ignoreGroup = Ignore)
      .writeStream.format("memory").queryName("sketch_q")
      .outputMode(OutputMode.Append()).start()
    try {
      val (c1, c2) = rows.splitAt(2500) // two data micro-batches: state must fold
      input.addData(c1.toSeq); q.processAllAvailable()
      input.addData(c2.toSeq); q.processAllAvailable()
      input.addData((Ignore, 0L, maxTs + 86400L * 1000000L)); q.processAllAvailable()
      input.addData((Ignore, 0L, maxTs + 2L * 86400L * 1000000L)); q.processAllAvailable()
    } finally q.stop()
    graft.streaming.LateDrops.assertNone(q, "sketch_q")
    val out = spark.table("sketch_q")
      .as[StreamingSketchQuantiles.SketchRow].collect()
    spark.catalog.dropTempView("sketch_q")
    assert(out.length == 4) // 2 groups x 2 permilles, ONE flush each
    val byGroup = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    out.foreach { r =>
      val sorted = byGroup(r.group)
      assert(r.nTotal == sorted.length.toLong)
      assert(r.errBoundRank == SketchQuantiles.errBoundRank(r.nTotal, 128))
      val t = targetRank(r.nTotal, r.pPermille)
      assert(rankOk(sorted, r.valueEst, t, r.errBoundRank), r.toString)
    }
  }

  test("weighted streaming twin: mass fold across micro-batches, certified within bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamingSketchQuantiles
    implicit val sqlCtx = spark.sqlContext
    val Ignore = "\u0000ignore"
    val vs = lcg(6000, seed = 9L)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      (s"g${i % 2}", v, (math.abs(v) % 9L) + 1L, (i + 1).toLong * 1000000L)
    }
    val maxTs = rows.map(_._4).max
    val input = MemoryStream[(String, Long, Long, Long)]
    val items = input.toDS().toDF("group", "v", "w", "tsMicros")
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", "10 seconds")
      .as[StreamingSketchQuantiles.WItem]
    val q = StreamingSketchQuantiles.quantilesWeighted(spark, items, k = 128,
        psPermille = Seq(500, 990), gapSeconds = 60L, ignoreGroup = Ignore)
      .writeStream.format("memory").queryName("sketch_qw")
      .outputMode(OutputMode.Append()).start()
    try {
      val (c1, c2) = rows.splitAt(2500) // two data micro-batches: state must fold
      input.addData(c1.toSeq); q.processAllAvailable()
      input.addData(c2.toSeq); q.processAllAvailable()
      input.addData((Ignore, 0L, 1L, maxTs + 86400L * 1000000L)); q.processAllAvailable()
      input.addData((Ignore, 0L, 1L, maxTs + 2L * 86400L * 1000000L)); q.processAllAvailable()
    } finally q.stop()
    graft.streaming.LateDrops.assertNone(q, "sketch_qw")
    val out = spark.table("sketch_qw")
      .as[StreamingSketchQuantiles.SketchRow].collect()
    spark.catalog.dropTempView("sketch_qw")
    assert(out.length == 4) // 2 groups x 2 permilles, ONE flush each
    val byGroup = rows.groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(r => (r._2, r._3)).toArray }
    out.foreach { r =>
      val items = byGroup(r.group)
      val mass = items.map(_._2).sum
      assert(r.nTotal == mass) // n is the group's total MASS
      assert(r.errBoundRank == SketchQuantiles.errBoundRank(mass, 128))
      val t = targetRank(r.nTotal, r.pPermille)
      assert(rankOkW(items, r.valueEst, t, r.errBoundRank), r.toString)
    }
  }
}
