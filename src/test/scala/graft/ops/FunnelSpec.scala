package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel.priorCounts must equal the naive (case-key-only) join on a
  * skewed log — a hot user whose purchase×click history would melt a
  * single reducer under the bare equi-join — including boundary
  * events exactly at the window edge and targets with no sources.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val dayUs = 86400000000L

  test("bucketed funnel == naive range join on a hot user (window edges included)") {
    val rnd = new scala.util.Random(7)
    // hot user 1: 60 purchases + 400 clicks over ~12 days;
    // user 2: purchases with zero clicks; user 3: clicks only.
    val rows =
      (1 to 60).map(i => (1L, s"p$i", "purchase",
        (rnd.nextInt(12).toLong * dayUs + rnd.nextInt(86400).toLong * 1000000L))) ++
      (1 to 400).map(i => (1L, s"c$i", "click",
        (rnd.nextInt(12).toLong * dayUs + rnd.nextInt(86400).toLong * 1000000L))) ++
      Seq((2L, "p0", "purchase", 5L * dayUs),
          // exactly-at-window-edge pair: c at t, p at t+window (<= keeps it)
          (3L, "ce", "click", 2L * dayUs),
          (3L, "pe", "purchase", 3L * dayUs),
          // one micro past the edge (dropped)
          (3L, "cf", "click", 6L * dayUs - 1L),
          (3L, "pf", "purchase", 7L * dayUs))
    val ev = rows.toDF("user_id", "event_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))

    val bucketed = Funnel.priorCounts(purchases, clicks,
        "user_id", "purchase_id", "ts", dayUs)
      .as[(Long, String, Long)].collect()
      .map { case (u, p, n) => (u, p) -> n }.toMap

    val naive = purchases.join(clicks.withColumnRenamed("ts", "c_ts"), Seq("user_id"), "left")
      .withColumn("_hit", when(col("c_ts").isNotNull &&
        col("c_ts") < col("ts") &&
        unix_micros(col("ts")) - unix_micros(col("c_ts")) <= dayUs, 1L).otherwise(0L))
      .groupBy("user_id", "purchase_id").agg(sum("_hit").as("n"))
      .as[(Long, String, Long)].collect()
      .map { case (u, p, n) => (u, p) -> n }.toMap

    assert(bucketed == naive)
    assert(bucketed((2L, "p0")) == 0L)           // target with no sources survives
    assert(bucketed((3L, "pe")) == 1L)           // edge: t - s == window kept
    assert(bucketed((3L, "pf")) == 0L)           // 1µs past window dropped
    assert(bucketed.values.sum > 0L)             // non-vacuous
  }

  test("orderedStages: strict order, not co-occurrence") {
    // u1: v(1) c(2) p(3)   — full funnel
    // u2: c(1) v(2)        — click BEFORE first view: stops at view
    // u3: v(1) c(2)        — no purchase: stops at click
    // u4: p(1) v(2) c(3) p(4) — early purchase ignored, late one counts
    // u5: c(1) p(2)        — never views: reaches nothing
    val rows = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 1L), (2L, "view", 2L),
      (3L, "view", 1L), (3L, "click", 2L),
      (4L, "purchase", 1L), (4L, "view", 2L), (4L, "click", 3L), (4L, "purchase", 4L),
      (5L, "click", 1L), (5L, "purchase", 2L))
    val ev = rows.toDF("user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val got = Funnel.orderedStages(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, "view", 4L), (1, "click", 3L), (2, "purchase", 2L)))
  }

  test("conversionTimes: converting cases only, t(last first-reach) - t(stage-0 first-reach)") {
    // u1: v(1) c(2) p(5)            — converts, 5-1 = 4
    // u4: p(1) v(2) c(3) p(4)       — early purchase ignored: 4-2 = 2
    // u3: v(1) c(2)                 — no purchase: absent
    // u6: v(1) v(10) c(11) p(12)    — t0 is the FIRST view: 12-1 = 11
    val rows = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 5L),
      (3L, "view", 1L), (3L, "click", 2L),
      (4L, "purchase", 1L), (4L, "view", 2L), (4L, "click", 3L), (4L, "purchase", 4L),
      (6L, "view", 1L), (6L, "view", 10L), (6L, "click", 11L), (6L, "purchase", 12L))
    val ev = rows.toDF("user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val got = Funnel.conversionTimes(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 4L, 4L -> 2L, 6L -> 11L))
  }

  test("orderedStages: same-timestamp events do not advance (strict >)") {
    val ev = Seq((1L, "view", 1L), (1L, "click", 1L))
      .toDF("user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val got = Funnel.orderedStages(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click")))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, "view", 1L), (1, "click", 0L)))
  }
}
