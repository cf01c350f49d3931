package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-pass Misra-Gries heavy hitters: exactness vs a naive group-by
  * on skewed data, partitioning independence of the OUTPUT (the
  * intermediate sketch is partitioning-dependent by design), the
  * undercount bound of the fold itself, and the static guarantee
  * check.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("exact vs naive group-by on a zipf-ish stream, incl. threshold boundary") {
    val rnd = new scala.util.Random(17)
    // zipf-ish: item i drawn with weight ~ 1/(i+1); ~60 distinct
    val pool = (0 until 60).flatMap(i => Seq.fill(60 / (i + 1))(s"w$i"))
    val rows = (1 to 20000).map(_ => pool(rnd.nextInt(pool.size)))
    val n = rows.size.toLong
    for (ppm <- Seq(2000, 10000, 50000)) {
      val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
      val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).toMap
      // k intentionally SMALL (but above the static bound) so the
      // sketch actually evicts — superset-not-luck is what's under test
      val k = (1000000 / ppm) + 7
      val got = HeavyHitters
        .exactHeavyHitters(rows.toDF("x"), col("x"), ppm, k)
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"ppm=$ppm k=$k thr=$thr " +
        s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    }
  }

  test("output is partitioning-independent (1 vs 17 partitions)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 8000).map(_ => s"t${rnd.nextInt(300)}")
    def run(parts: Int) = HeavyHitters
      .exactHeavyHitters(rows.toDF("x").repartition(parts), col("x"),
        ppm = 3000, k = 512)
      .as[(String, Long)].collect().toMap
    assert(run(1) == run(17) && run(1).nonEmpty)
  }

  test("mgMerge undercount bound: counter >= true - N/(k+1)") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 5000).map(_ => s"v${rnd.nextInt(400)}")
    val k = 50
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = HeavyHitters.mgMerge(rows.iterator.map((_, 1L)), k).toMap
    assert(sketch.size <= k)
    val bound = rows.size.toLong / (k + 1)
    truth.foreach { case (item, c) =>
      val est = sketch.getOrElse(item, 0L)
      assert(est <= c && est >= c - bound, s"$item true=$c est=$est bound=$bound")
    }
  }

  test("byGroup: exact vs naive per-group, incl. a group where nothing is heavy") {
    val rnd = new scala.util.Random(41)
    // group a: skewed (heavy items exist); group b: near-uniform over a
    // wide universe (often nothing reaches the threshold); group c: tiny
    val rows =
      (1 to 6000).map(_ => ("a", s"w${(rnd.nextGaussian().abs * 8).toInt}")) ++
      (1 to 6000).map(_ => ("b", s"u${rnd.nextInt(3000)}")) ++
      (1 to 40).map(_ => ("c", s"t${rnd.nextInt(3)}"))
    val ppm = 20000
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val n = rs.size.toLong
      val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
      rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).map { case (i, c) => (g, i, c) }
    }.toSet
    val got = HeavyHitters.exactHeavyHittersByGroup(
        rows.toDF("g", "x").repartition(7), col("g"), col("x"),
        ppm, k = (1000000 / ppm) + 5)
      .as[(String, String, Long)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("static superset-guarantee check rejects an undersized k") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(Seq("a").toDF("x"), col("x"),
        ppm = 75, k = 1000) // needs k+1 > 13333
    }
  }

  test("one-pass sketch: superset of heavy set, lower bounds within N/(k+1), exact N") {
    val rnd = new scala.util.Random(61)
    val pool = (0 until 80).flatMap(i => Seq.fill(80 / (i + 1))(s"w$i"))
    val rows = (1 to 15000).map(_ => pool(rnd.nextInt(pool.size)))
    val n = rows.size.toLong
    for (ppm <- Seq(3000, 20000); parts <- Seq(1, 13)) {
      val k = (1000000 / ppm) + 9 // small: evictions + prune both real
      val thr = (n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L
      val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = truth.filter(_._2 >= thr)
      val est = HeavyHitters.sketchHeavyHitters(
          rows.toDF("x").repartition(parts), col("x"), ppm, k)
        .as[(String, Long, Long)].collect()
      assert(est.forall(_._3 == n), "n_total must be the exact stream length")
      val bound = n / (k + 1L)
      val got = est.map(e => e._1 -> e._2).toMap
      heavy.foreach { case (item, c) =>
        val w = got.getOrElse(item, fail(s"heavy $item missing (parts=$parts)"))
        assert(w <= c && c - w <= bound, s"$item true=$c lower=$w bound=$bound")
      }
      // every emitted row's lower bound never overcounts any item
      got.foreach { case (item, w) => assert(w <= truth(item)) }
    }
  }

  test("mgAudit: all flags true for a real sketch; found=false detects a doctored one") {
    val rnd = new scala.util.Random(73)
    val rows = (1 to 9000).map(_ => s"v${(rnd.nextGaussian().abs * 6).toInt}")
    val df = rows.toDF("x").repartition(5)
    val ppm = 10000; val k = 111
    val est = HeavyHitters.sketchHeavyHitters(df, col("x"), ppm, k)
      .select("item", "w_lower")
    val audit = HeavyHitters.mgAudit(df, col("x"), est, ppm, k)
      .as[(String, Long, Long, Long, Boolean, Boolean, Boolean)].collect()
    assert(audit.nonEmpty)
    assert(audit.forall { case (_, _, _, _, f, le, gap) => f && le && gap })
    // doctored estimate: drop the heaviest item -> its found flag flips
    val heaviest = audit.maxBy(_._2)._1
    val doctored = est.filter(col("item") =!= heaviest)
    val audit2 = HeavyHitters.mgAudit(df, col("x"), doctored, ppm, k)
      .as[(String, Long, Long, Long, Boolean, Boolean, Boolean)].collect()
    assert(audit2.exists { case (i, _, _, _, f, _, _) => i == heaviest && !f })
  }

  test("mgAudit sums segment rows: split lower bounds still certify") {
    // an item's substream flushed as two segments (the streaming
    // re-open case): per-segment MG lower bounds SUM to a valid
    // whole-stream lower bound with the summed gaps still <= N/(k+1)
    val rows = Seq.fill(400)("hot") ++ (1 to 200).map(i => s"cold$i")
    val df = rows.toDF("x")
    val seg = Seq(("hot", 150L), ("hot", 180L)).toDF("item", "w_lower")
    val audit = HeavyHitters.mgAudit(df, col("x"), seg, ppm = 500000, k = 3)
      .as[(String, Long, Long, Long, Boolean, Boolean, Boolean)].collect()
    val hot = audit.find(_._1 == "hot").get
    assert(hot._2 == 400L && hot._5 && hot._6,
      "summed segment bounds must stay <= exact")
    // 400 - 330 = 70 vs bound 600/4 = 150 -> gap_le_bound true
    assert(hot._7)
  }
}
