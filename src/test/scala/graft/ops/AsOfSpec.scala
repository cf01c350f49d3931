package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("range join: bucketed containment == naive BETWEEN join, edges inclusive") {
    val dayUs = 86400000000L
    val points = Seq(("p1", 5L), ("p2", 10L), ("p3", 100L), ("p4", 250L))
      .toDF("id", "t").withColumn("ts", timestamp_micros(col("t") * 1000000L))
    val intervals = Seq((0L, 10L), (8L, 120L), (300L, 400L))
      .toDF("s", "e")
      .withColumn("t_start", timestamp_micros(col("s") * 1000000L))
      .withColumn("t_end", timestamp_micros(col("e") * 1000000L))
    val got = RangeJoin.containmentCounts(points, intervals,
        "id", "ts", "t_start", "t_end", bucketUs = 7L * 1000000L)
      .as[(String, Long)].collect().toMap
    // p1∈[0,10]; p2∈[0,10] (inclusive end) and [8,120]; p3∈[8,120];
    // p4 in nothing (dropped, inner semantics)
    assert(got == Map("p1" -> 1L, "p2" -> 2L, "p3" -> 1L))
    // equality with the naive quadratic join
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("t_start") && col("ts") <= col("t_end"))
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == naive)
  }

  test("range join: stab-count == naive BETWEEN join on 20 random instances (ties included)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 20).foreach { _ =>
      val nP = 1 + rnd.nextInt(60)
      val nI = 1 + rnd.nextInt(40)
      // coarse second grid → frequent exact ties with interval endpoints
      val pts = (0 until nP).map(i => (s"p$i", rnd.nextInt(200).toLong))
      val ivs = (0 until nI).map { _ =>
        val a = rnd.nextInt(200).toLong; val b = a + rnd.nextInt(50)
        (a, b.toLong)
      }
      val points = pts.toDF("id", "t")
        .withColumn("ts", timestamp_micros(col("t") * 1000000L))
      val intervals = ivs.toDF("s", "e")
        .withColumn("t_start", timestamp_micros(col("s") * 1000000L))
        .withColumn("t_end", timestamp_micros(col("e") * 1000000L))
      val bucket = (1 + rnd.nextInt(30)).toLong * 1000000L
      val got = RangeJoin.containmentCounts(points, intervals,
          "id", "ts", "t_start", "t_end", bucketUs = bucket)
        .as[(String, Long)].collect().toMap
      val naive = points.crossJoin(intervals)
        .filter(col("ts") >= col("t_start") && col("ts") <= col("t_end"))
        .groupBy("id").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == naive, s"bucketUs=$bucket pts=$pts ivs=$ivs")
    }
  }

  test("range join auto: span-derived bucket width matches explicit buckets and bounds the cumsum") {
    val points = Seq(("p1", 5L), ("p2", 10L), ("p3", 100L), ("p4", 250L))
      .toDF("id", "t").withColumn("ts", timestamp_micros(col("t") * 1000000L))
    val intervals = Seq((0L, 10L), (8L, 120L), (300L, 400L))
      .toDF("s", "e")
      .withColumn("t_start", timestamp_micros(col("s") * 1000000L))
      .withColumn("t_end", timestamp_micros(col("e") * 1000000L))
    val auto = RangeJoin.containmentCountsAuto(points, intervals,
        "id", "ts", "t_start", "t_end", targetBuckets = 16)
      .as[(String, Long)].collect().toMap
    assert(auto == Map("p1" -> 1L, "p2" -> 2L, "p3" -> 1L))
    // the derived width really caps the bucket count at targetBuckets
    // regardless of span units (seconds here, could be years)
    val spanUs = 400L * 1000000L - 0L
    val b = RangeJoin.autoBucketUs(0L, spanUs, targetBuckets = 16)
    assert(spanUs / b + 1 <= 16)
    // degenerate span (all marks at one instant) still yields a
    // positive width
    assert(RangeJoin.autoBucketUs(42L, 42L, 16) == 1L)
  }

  test("backward as-of: greatest right ts <= left ts, inclusive, null when none") {
    val purchases = Seq((1L, "p50", 50L), (1L, "p150", 150L), (1L, "p200", 200L),
        (2L, "lonely", 500L))
      .toDF("user_id", "purchase_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val clicks = Seq((1L, 100L), (1L, 200L), (3L, 1L))
      .toDF("user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val got = AsOf.backward(purchases, clicks, "user_id", "purchase_id", "ts")
      .select(col("purchase_id"), unix_micros(col("asof_ts")).as("a"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("p50").isEmpty)          // no click at or before 50
    assert(got("p150").contains(100L))  // latest click <= 150
    assert(got("p200").contains(200L))  // equal ts is inclusive
    assert(got("lonely").isEmpty)       // key with no right rows at all
  }

  test("forward as-of: smallest right ts >= left ts within horizon, equal ts inclusive") {
    val purchases = Seq((1L, "p50", 50L), (1L, "p100", 100L), (1L, "p250", 250L),
        (1L, "p500", 500L), (2L, "lonely", 10L))
      .toDF("user_id", "purchase_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val clicks = Seq((1L, 100L), (1L, 200L), (1L, 400L), (3L, 1L))
      .toDF("user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val got = AsOf.forward(purchases, clicks, "user_id", "purchase_id", "ts",
        horizonUs = 100L)
      .select(col("purchase_id"), unix_micros(col("asof_fwd_ts")).as("a"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("p50").contains(100L))  // within [50, 150]
    assert(got("p100").contains(100L)) // equal ts is inclusive
    assert(got("p250").isEmpty)        // next click 400 > 250+100: horizon-cut
    assert(got("p500").isEmpty)        // no following click at all
    assert(got("lonely").isEmpty)      // key with no right rows
  }

  test("nearest as-of: closer of backward/bounded-forward, ties backward") {
    val purchases = Seq((1L, "tie", 150L), (1L, "fwd", 160L), (1L, "bwd", 130L),
        (1L, "cut", 390L), (1L, "only_b", 900L), (2L, "only_f", 10L))
      .toDF("user_id", "purchase_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val clicks = Seq((1L, 100L), (1L, 200L), (1L, 400L), (2L, 15L))
      .toDF("user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val got = AsOf.nearest(purchases, clicks, "user_id", "purchase_id", "ts",
        horizonUs = 100L)
      .select(col("purchase_id"), unix_micros(col("asof_near_ts")).as("a"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("tie").contains(100L))    // |150-100| == |200-150| -> backward
    assert(got("fwd").contains(200L))    // 200 is closer than 100
    assert(got("bwd").contains(100L))    // 100 is closer than 200
    // backward 200 is 190 away, forward 400 (inside [390,490]) is 10 -> forward
    assert(got("cut").contains(400L))
    assert(got("only_b").contains(400L)) // lookback unbounded: 900-400
    assert(got("only_f").contains(15L))  // no click before 10
  }

  test("forward as-of: extreme horizon saturates instead of overflowing") {
    // ts + horizon with horizonUs near Long.MaxValue would wrap
    // negative under non-ANSI (cutting EVERY match) or throw under
    // ANSI; the saturating guard must make it mean "any following
    // right row" — i.e. behave like an unbounded lookahead.
    val purchases = Seq((1L, "p50", 50L), (1L, "p500", 500L))
      .toDF("user_id", "purchase_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val clicks = Seq((1L, 400L)).toDF("user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val got = AsOf.forward(purchases, clicks, "user_id", "purchase_id", "ts",
        horizonUs = Long.MaxValue)
      .select(col("purchase_id"), unix_micros(col("asof_fwd_ts")).as("a"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("p50").contains(400L))  // would wrap negative without the guard
    assert(got("p500").isEmpty)        // still no FOLLOWING click
  }

  test("forward/nearest vs brute force on random instances") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 10).foreach { _ =>
      val nP = 1 + rnd.nextInt(40)
      val nC = rnd.nextInt(30)
      val h = (1 + rnd.nextInt(60)).toLong
      val ps = (0 until nP).map(i => (rnd.nextInt(3).toLong, s"p$i", rnd.nextInt(200).toLong))
      val cs = (0 until nC).map(_ => (rnd.nextInt(3).toLong, rnd.nextInt(200).toLong))
      val purchases = ps.toDF("user_id", "purchase_id", "t")
        .withColumn("ts", timestamp_micros(col("t"))).drop("t")
      val clicks = cs.toDF("user_id", "t")
        .withColumn("ts", timestamp_micros(col("t"))).drop("t")
      val fwd = AsOf.forward(purchases, clicks, "user_id", "purchase_id", "ts", h)
        .select(col("purchase_id"), unix_micros(col("asof_fwd_ts")))
        .as[(String, Option[Long])].collect().toMap
      val near = AsOf.nearest(purchases, clicks, "user_id", "purchase_id", "ts", h)
        .select(col("purchase_id"), unix_micros(col("asof_near_ts")))
        .as[(String, Option[Long])].collect().toMap
      ps.foreach { case (u, id, t) =>
        val mine = cs.filter(_._1 == u).map(_._2)
        val bf = mine.filter(_ <= t).sorted.lastOption
        val ff = mine.filter(c => c >= t && c <= t + h).sorted.headOption
        assert(fwd(id) == ff, s"fwd $id t=$t h=$h cs=$mine")
        val expNear = (bf, ff) match {
          case (None, x) => x
          case (x, None) => x
          case (Some(b), Some(f)) => if (t - b <= f - t) Some(b) else Some(f)
        }
        assert(near(id) == expNear, s"near $id t=$t h=$h cs=$mine")
      }
    }
  }

  test("as-of payloads ride the running extremes; ties are struct-ordered") {
    // clicks with (key, ts) TIES carrying distinct payloads — the
    // case the class-doc tie policy pins: backward takes the greatest
    // (ts, payload) struct; forward the least among strictly-later
    // rows, but a match at exactly the left ts inherits backward's
    // greatest-payload direction (the equal-ts recovery path)
    val purchases = Seq((1L, "P60", 60L), (1L, "P100", 100L),
        (1L, "P150", 150L), (1L, "P250", 250L))
      .toDF("user_id", "purchase_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val clicks = Seq((1L, 100L, 10L), (1L, 100L, 20L),
        (1L, 200L, 5L), (1L, 200L, 7L))
      .toDF("user_id", "t", "pay")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")

    val bwd = AsOf.backward(purchases, clicks, "user_id", "purchase_id",
        "ts", payloadCols = Seq("pay"))
      .select(col("purchase_id"), unix_micros(col("asof_ts")), col("asof_pay"))
      .as[(String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(bwd("P60") == ((None, None)))
    assert(bwd("P100") == ((Some(100L), Some(20L)))) // tie -> greatest pay
    assert(bwd("P150") == ((Some(100L), Some(20L))))
    assert(bwd("P250") == ((Some(200L), Some(7L))))

    val fwd = AsOf.forward(purchases, clicks, "user_id", "purchase_id",
        "ts", horizonUs = 100L, payloadCols = Seq("pay"))
      .select(col("purchase_id"), unix_micros(col("asof_fwd_ts")),
        col("asof_fwd_pay"))
      .as[(String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fwd("P60") == ((Some(100L), Some(10L))))  // strictly later: least
    assert(fwd("P100") == ((Some(100L), Some(20L)))) // equal-ts: greatest
    assert(fwd("P150") == ((Some(200L), Some(5L))))
    assert(fwd("P250") == ((None, None)))            // nothing in horizon

    val near = AsOf.nearest(purchases, clicks, "user_id", "purchase_id",
        "ts", horizonUs = 100L, payloadCols = Seq("pay"))
      .select(col("purchase_id"), unix_micros(col("asof_near_ts")),
        col("asof_near_pay"))
      .as[(String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(near("P60") == ((Some(100L), Some(10L))))  // only forward
    assert(near("P100") == ((Some(100L), Some(20L)))) // both at d=0 -> bwd
    assert(near("P150") == ((Some(100L), Some(20L)))) // d=50 tie -> bwd
    assert(near("P250") == ((Some(200L), Some(7L))))  // only backward
  }

  test("range join auto: both inputs empty returns empty, no NPE") {
    val points = Seq.empty[(String, Long)].toDF("id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val intervals = Seq.empty[(Long, Long)].toDF("s", "e")
      .withColumn("t_start", timestamp_micros(col("s")))
      .withColumn("t_end", timestamp_micros(col("e")))
    val got = RangeJoin.containmentCountsAuto(points, intervals,
      "id", "ts", "t_start", "t_end")
    assert(got.count() == 0L)
  }
}
