package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSkewSpec extends SparkSpec {

  import spark.implicits._

  test("sessionize: splits on gap, 0-based per case, order-stable") {
    val events = Seq(
      (1L, 100L), (1L, 200L), (1L, 5000L), (1L, 5100L), (1L, 99999L),
      (2L, 50L)
    ).toDF("case", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L))
    val s = Sessionize.byGap(events, "case", "ts", "t", gapSeconds = 1000L)
      .select(col("case"), col("t"), col("session_idx"))
      .as[(Long, Long, Long)].collect().toSet
    assert(s == Set(
      (1L, 100L, 0L), (1L, 200L, 0L),        // session 0
      (1L, 5000L, 1L), (1L, 5100L, 1L),      // gap 4800 > 1000
      (1L, 99999L, 2L),                      // gap ~94899
      (2L, 50L, 0L)))
  }

  test("throttleDedup: keeps first, drops within-gap followers, lag-relative") {
    val events = Seq(
      // key (1,"c"): 0 kept; 5 dropped (gap 5<=10); 9 dropped (gap 4
      // from the PREVIOUS event, not the last kept); 25 kept (gap 16)
      (1L, "c", 0L), (1L, "c", 5L), (1L, "c", 9L), (1L, "c", 25L),
      // different type same user: independent window
      (1L, "v", 6L),
      (2L, "c", 1L))
      .toDF("user", "typ", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L))
    val kept = Sessionize.throttleDedup(events, Seq("user", "typ"), "ts",
        tieBreak = "t", gapSeconds = 10L)
      .filter(col("kept")).select(col("user"), col("typ"), col("t"))
      .as[(Long, String, Long)].collect().toSet
    assert(kept == Set(
      (1L, "c", 0L), (1L, "c", 25L), (1L, "v", 6L), (2L, "c", 1L)))
  }

  test("variants: ordered activity sequences counted") {
    val events = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 4L), (2L, "b", 5L), (2L, "c", 6L),
      (3L, "a", 7L), (3L, "c", 8L), (3L, "b", 9L)
    ).toDF("case", "act", "t").withColumn("ts", timestamp_micros(col("t")))
    val v = Sessionize.variants(events, "case", "act", "ts", "t")
      .as[(String, Long)].collect().toMap
    assert(v == Map("a>b>c" -> 2L, "a>c>b" -> 1L))
  }

  test("salted aggregation equals plain groupBy (skew-safe two-stage)") {
    // heavily skewed: one key owns 90% of rows
    val df = spark.range(10000L)
      .select(when(col("id") < 9000, lit("hot")).otherwise(col("id").cast("string")).as("k"),
        lit(1L).as("v"))
    val plainC = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val saltedC = Skew.saltedCount(df, "k", salts = 16)
      .as[(String, Long)].collect().toMap
    assert(saltedC == plainC)
    val plainS = df.groupBy("k").agg(sum("v")).as[(String, Long)].collect().toMap
    val saltedS = Skew.saltedSum(df, "k", "v", salts = 16)
      .as[(String, Long)].collect().toMap
    assert(saltedS == plainS)
  }

  test("salted join equals plain join on a skewed fact side") {
    val fact = spark.range(5000L)
      .select(when(col("id") < 4000, lit(1L)).otherwise(col("id") % 50L).as("k"),
        col("id").as("v"))
    val dim = spark.range(50L).select(col("id").as("k"),
      (col("id") * 10L).as("attr"))
    val plain = fact.join(dim, "k")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("runs: consecutive same-label events collapse; order is (ts, tie)") {
    val rows = Seq(
      // case 1: a a b a  -> runs a(2), b(1), a(1)
      (1L, "a", 1L, 1L), (1L, "a", 2L, 2L), (1L, "b", 3L, 3L), (1L, "a", 4L, 4L),
      // case 2: tie on ts broken by event_id: b(id5) then a(id6)
      (2L, "b", 1L, 5L), (2L, "a", 1L, 6L),
      // case 3: single run of 3
      (3L, "c", 1L, 7L), (3L, "c", 2L, 8L), (3L, "c", 3L, 9L))
    val ev = rows.toDF("case", "label", "t", "eid")
      .withColumn("ts", timestamp_micros(col("t")))
    val got = Sessionize.runs(ev, "case", "label", "ts", "eid")
      .select(col("case"), col("run_idx"), col("label"),
        unix_micros(col("run_start")).as("s"),
        unix_micros(col("run_end")).as("e"), col("n_events"))
      .as[(Long, Long, String, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      (1L, 1L, "a", 1L, 2L, 2L), (1L, 2L, "b", 3L, 3L, 1L), (1L, 3L, "a", 4L, 4L, 1L),
      (2L, 1L, "b", 1L, 1L, 1L), (2L, 2L, "a", 1L, 1L, 1L),
      (3L, 1L, "c", 1L, 3L, 3L)))
  }
}
