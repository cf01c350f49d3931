package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact quantile selection: naive-reference equivalence on random
  * data (with heavy ties), bucket-count invariance, boundary permille
  * targets, and partitioning independence.
  */
class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  /** rank-ceil selection on a locally sorted multiset. */
  private def naive(vs: Seq[Long], pPermille: Int): Long = {
    val sorted = vs.sorted
    val rank = (pPermille.toLong * vs.size + 999) / 1000
    sorted((rank - 1).toInt)
  }

  private val ps = Seq(1, 250, 500, 750, 990, 1000)

  test("matches naive sorted selection on random data with ties") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 3}", rnd.nextInt(200).toLong) // heavy ties
    }
    val df = rows.toDF("grp", "v")
    val got = Quantiles.exactByGroup(df, Seq("grp"), col("v"), ps)
      .as[(String, Int, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      ps.map(p => (g, p, naive(rs.map(_._2), p)))
    }.toSet
    assert(got == want)
  }

  test("p=1000 selects the max, p=1 the min (n > 1000)") {
    val df = (1L to 2000L).map(v => ("g", v)).toDF("grp", "v")
    val got = Quantiles.exactByGroup(df, Seq("grp"), col("v"), Seq(1, 1000))
      .as[(String, Int, Long)].collect().map { case (_, p, v) => (p, v) }.toMap
    assert(got == Map(1 -> 2L, 1000 -> 2000L))
  }

  test("bucket-count invariance: 2 vs 4096 target buckets") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 3000).map(_ => ("g", rnd.nextInt(100000).toLong)).toDF("grp", "v")
    val a = Quantiles.exactByGroup(df, Seq("grp"), col("v"), ps, targetBuckets = 2)
      .as[(String, Int, Long)].collect().toSet
    val b = Quantiles.exactByGroup(df, Seq("grp"), col("v"), ps, targetBuckets = 4096)
      .as[(String, Int, Long)].collect().toSet
    assert(a == b)
  }

  test("partitioning independence (1 vs 16 partitions)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map(i => (s"g${i % 5}", rnd.nextInt(1000).toLong))
    val a = Quantiles.exactByGroup(rows.toDF("grp", "v").repartition(1),
      Seq("grp"), col("v"), ps).as[(String, Int, Long)].collect().toSet
    val b = Quantiles.exactByGroup(rows.toDF("grp", "v").repartition(16),
      Seq("grp"), col("v"), ps).as[(String, Int, Long)].collect().toSet
    assert(a == b)
  }

  test("permilleRank matches naive strict-below share, ties share a rank") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 2000).map(i => (i.toLong, s"g${i % 2}", rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "grp", "v")
    val got = Quantiles.permilleRank(df, Seq("grp"), "id", col("v"))
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, _, v, pm) => (id, v, pm) }.toSet
    val byG = rows.groupBy(_._2)
    val want = rows.map { case (id, g, v) =>
      val vs = byG(g).map(_._3)
      (id, v, 1000L * vs.count(_ < v) / vs.size)
    }.toSet
    assert(got == want)
  }

  test("permilleRank with no group columns (global transform)") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)).toDF("id", "v")
    val got = Quantiles.permilleRank(df, Seq(), "id", col("v"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 0L), (2L, 20L, 250L), (3L, 20L, 250L), (4L, 30L, 750L)))
  }

  test("negative values and a single-row group") {
    val df = Seq(("g", -5L), ("g", -1L), ("g", 3L), ("h", 7L)).toDF("grp", "v")
    val got = Quantiles.exactByGroup(df, Seq("grp"), col("v"), Seq(500, 1000))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("g", 500, -1L), ("g", 1000, 3L), ("h", 500, 7L), ("h", 1000, 7L)))
  }

  test("outlierCounts == naive threshold-count on random data with ties") {
    // the one-pass algebra (n_above = n − cum_inclusive at the selected
    // quantile row) must equal the two-pass definition: count rows
    // STRICTLY above the group's own rank-ceil threshold. Heavy ties
    // stress the inclusive-count edge (tied-at-threshold rows are NOT
    // above it); p=1000 pins n_above = 0.
    val rnd = new scala.util.Random(99)
    val rows = (1 to 4000).map(i => (s"g${i % 4}", rnd.nextInt(150).toLong))
    val df = rows.toDF("grp", "v")
    for (p <- Seq(250, 500, 990, 1000)) {
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        val vs = rs.map(_._2)
        val thr = naive(vs, p)
        g -> ((vs.size.toLong, vs.count(_ > thr).toLong))
      }
      val got = Quantiles.outlierCounts(df, Seq("grp"), col("v"), p)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected, s"p=$p got=$got expected=$expected")
    }
  }

  /** Naive clip-then-compute reference for ALL winsorized moments,
    * with the kernel's EXACT ieee expression tree for the derived
    * doubles (sumsq/n − (sum/n)·(sum/n), clamped at 0, then sqrt) —
    * equality below is bit-exact, which is the cross-engine
    * determinism claim itself. */
  private def naiveWinsor(vs: Seq[Long], lo: Int, hi: Int)
      : (Long, Long, Long, Double, Double, Double, Double, Double) = {
    val (lv, hv) = (naive(vs, lo), naive(vs, hi))
    val cl = vs.map(v => math.min(math.max(v, lv), hv))
    val s = cl.sum.toDouble
    val s2 = cl.map(v => v * v).sum.toDouble
    val n = vs.size.toDouble
    val mean = s / n
    val vr = math.max(0d, s2 / n - mean * mean)
    (vs.size.toLong, lv, hv, s, s2, mean, vr, math.sqrt(vr))
  }

  test("winsorizedStats == naive clip moments on random data with ties") {
    // the one-pass algebra (lo-lift + weighted band + hi-clip, for both
    // Σclip and Σclip²) must equal the clip-then-compute definition;
    // heavy ties stress the at-threshold edges (tied-at-lo rows are NOT
    // lifted, tied-at-hi rows are NOT clipped). Negative values stress
    // the signed prefix sums. (1,1000) pins winsorized_sum == plain sum.
    val rnd = new scala.util.Random(77)
    val rows = (1 to 4000).map(i => (s"g${i % 4}", rnd.nextInt(120).toLong - 20L))
    val df = rows.toDF("grp", "v")
    for ((lo, hi) <- Seq((10, 990), (250, 750), (1, 1000))) {
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> naiveWinsor(rs.map(_._2), lo, hi)
      }
      val got = Quantiles.winsorizedStats(df, Seq("grp"), col("v"), lo, hi)
        .as[(String, Long, Long, Long, Double, Double, Double, Double, Double)]
        .collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9)))
        .toMap
      assert(got == expected, s"($lo,$hi) got=$got expected=$expected")
    }
  }

  test("winsorizedStats with no group columns (global robust stats)") {
    val vs = (1L to 500L).toSeq
    val df = vs.map(("x", _)).toDF("ignore", "v").select(col("v"))
    val got = Quantiles.winsorizedStats(df, Seq(), col("v"), 10, 990)
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(naiveWinsor(vs, 10, 990)))
  }

  test("winsorizedStats: constant group pins var = std = 0 exactly") {
    // a constant column's clipped variance must be EXACTLY zero — the
    // greatest(0, ·) clamp has to absorb any cancellation residue so
    // sqrt never sees a negative
    val df = (1 to 1200).map(_ => ("g", 41L)).toDF("grp", "v")
    val got = Quantiles.winsorizedStats(df, Seq("grp"), col("v"), 10, 990)
      .select("winsorized_var", "winsorized_std")
      .as[(Double, Double)].collect()
    assert(got.toSeq == Seq((0d, 0d)))
  }

  test("winsorizedStats: bucket-count invariance and empty input") {
    val empty = Seq.empty[(String, Long)].toDF("grp", "v")
    assert(Quantiles.winsorizedStats(empty, Seq("grp"), col("v"), 10, 990)
      .count() == 0L)
    val df = (1 to 900).map(i => ("g", (i % 53).toLong)).toDF("grp", "v")
    def run(buckets: Int) =
      Quantiles.winsorizedStats(df, Seq("grp"), col("v"), 10, 990,
        targetBuckets = buckets)
        .as[(String, Long, Long, Long, Double, Double, Double, Double, Double)]
        .collect().toSet
    val (a, b) = (run(2), run(4096))
    assert(a == b && a.nonEmpty)
  }

  test("outlierCounts: empty input and bucket-count invariance") {
    val empty = Seq.empty[(String, Long)].toDF("grp", "v")
    assert(Quantiles.outlierCounts(empty, Seq("grp"), col("v"), 990).count() == 0L)
    val df = (1 to 1000).map(i => ("g", (i % 37).toLong)).toDF("grp", "v")
    val a = Quantiles.outlierCounts(df, Seq("grp"), col("v"), 990, targetBuckets = 2)
      .as[(String, Long, Long)].collect().toSet
    val b = Quantiles.outlierCounts(df, Seq("grp"), col("v"), 990, targetBuckets = 4096)
      .as[(String, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
