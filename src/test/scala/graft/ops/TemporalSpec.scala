package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal profile / deviation conformance / performance spectrum vs
  * brute-force recomputation on in-memory traces. */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: Seq[(String, String, Long)]) =
    rows.toDF("case", "act", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L))

  // (case, act, tSeconds) → brute consecutive pairs (from, to, waitS)
  private def brutePairs(rows: Seq[(String, String, Long)]) =
    rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._3, e._2)).sliding(2).collect {
        case Seq(a, b) => (a._2, b._2, b._3 - a._3)
      }
    }

  val rows = Seq(
    ("c1", "a", 0L), ("c1", "b", 10L), ("c1", "a", 30L), ("c1", "b", 31L),
    ("c2", "a", 5L), ("c2", "b", 20L), ("c2", "c", 22L),
    ("c3", "a", 0L), ("c3", "b", 1000L), // the a->b outlier
    ("c4", "x", 7L)) // singleton case: no pairs

  test("profile: n / sum / sumsq per segment match brute force") {
    val got = Temporal.profile(ev(rows), "case", "act", "ts", "t")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val exp = brutePairs(rows).groupBy(p => (p._1, p._2)).map {
      case (k, ps) => k -> ((ps.size.toLong,
        ps.map(_._3).sum.toDouble, ps.map(w => w._3 * w._3).sum.toDouble))
    }
    assert(got == exp)
    assert(got(("a", "b"))._1 == 4L) // non-vacuous: multi-occurrence segment
  }

  test("deviations: z-flag matches a direct mean/std computation") {
    val zeta = 2.0
    val got = Temporal.deviations(ev(rows), "case", "act", "ts", "t", zeta)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val exp = brutePairs(rows).groupBy(p => (p._1, p._2)).map {
      case (k, ps) =>
        val ws = ps.map(_._3.toDouble)
        val n = ws.size
        val mean = ws.sum / n
        val varr = ws.map(w => (w - mean) * (w - mean)).sum / n
        val nDev =
          if (n < 2) 0
          else ws.count(w => (w - mean) * (w - mean) > zeta * zeta * varr)
        k -> ((n.toLong, nDev.toLong))
    }
    assert(got == exp)
    assert(got(("a", "b"))._1 == 4L) // non-vacuous: multi-occurrence segment
  }

  test("deviations: planted far outlier in a tight segment is flagged") {
    // 9 waits of 10s + one of 10000s: z of the outlier >> 2
    val tight = (0 until 9).map(i => Seq(
      (s"t$i", "p", 0L), (s"t$i", "q", 10L))).flatten ++
      Seq(("t9", "p", 0L), ("t9", "q", 10000L))
    val got = Temporal.deviations(ev(tight), "case", "act", "ts", "t", 2.0)
      .as[(String, String, Long, Long)].collect().head
    assert((got._1, got._2, got._3) == (("p", "q", 10L)))
    assert(got._4 == 1L) // exactly the planted outlier
  }

  test("deviations: n=1 and zero-variance segments flag nothing") {
    val flat = Seq(
      ("c1", "a", 0L), ("c1", "b", 5L),
      ("c2", "a", 0L), ("c2", "b", 5L),
      ("c3", "x", 0L), ("c3", "y", 99L)) // x->y occurs once
    val got = Temporal.deviations(ev(flat), "case", "act", "ts", "t", 2.0)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got == Map(("a", "b") -> 0L, ("x", "y") -> 0L))
  }

  test("profile + deviations vs brute force on random instances") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 8).foreach { _ =>
      val nCase = 1 + rnd.nextInt(12)
      val acts = Seq("a", "b", "c")
      val data = (0 until nCase).flatMap { c =>
        (0 until 1 + rnd.nextInt(8)).map { _ =>
          (s"c$c", acts(rnd.nextInt(acts.size)), rnd.nextInt(500).toLong)
        }
      }
      // drop (case, ts) duplicates: ties across DIFFERENT activities
      // would make the order tie-break-dependent, which the events
      // table contract (unique (case, ts)) already excludes
      val rows = data.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
      val zeta = 1.5
      val got = Temporal.deviations(ev(rows), "case", "act", "ts", "t", zeta)
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      val exp = brutePairs(rows).groupBy(p => (p._1, p._2)).map {
        case (k, ps) =>
          val ws = ps.map(_._3.toDouble)
          val n = ws.size
          val mean = ws.sum / n
          val varr = ws.map(w => (w - mean) * (w - mean)).sum / n
          val nDev =
            if (n < 2) 0
            else ws.count(w => (w - mean) * (w - mean) > zeta * zeta * varr)
          k -> ((n.toLong, nDev.toLong))
      }
      assert(got == exp, s"rows=$rows")
    }
  }

  test("spectrum: value bands against brute-force exact quantiles") {
    val got = Temporal.spectrum(ev(rows), "case", "act", "ts", "t")
      .as[(String, String, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    val exp = brutePairs(rows).map(p => (p._1, p._2, p._3 * 1000000L))
      .groupBy(p => (p._1, p._2)).toSeq.flatMap { case ((f, t), ps) =>
        val sorted = ps.map(_._3).sorted
        val n = sorted.size
        def q(p: Int) = sorted((n / 1000) * p + ((n % 1000) * p + 999) / 1000 - 1)
        val (q1, q2, q3) = (q(250), q(500), q(750))
        ps.map(_._3).groupBy(w =>
          1 + (if (w > q1) 1 else 0) + (if (w > q2) 1 else 0)
            + (if (w > q3) 1 else 0))
          .map { case (b, ws) =>
            (f, t, b) -> ((ws.size.toLong, ws.min, ws.max)) }
      }.toMap
    assert(got == exp)
    assert(got.keySet.map(_._3).max >= 2) // bands are non-degenerate
  }
}
