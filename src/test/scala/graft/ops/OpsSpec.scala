package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dsl.Cnf

/** Specs for Split, Dfg, LogStats, Cnf over hand-built and synthetic
  * data. The Split ratio test ports the reference's statistical
  * assertion (`/root/reference/src/stream/split.rs:161-224`): exact
  * membership is engine-specific (SURVEY.md §7.4.5), the train-ratio
  * convergence is the portable contract.
  */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  test("split: case granularity — every case lands in exactly one branch") {
    val events = (1L to 2000L).flatMap(c => (0 until 5).map(i => (c, i))).toDF("case_id", "i")
    val (train, test) = Split.split(events, "case_id", 800, seed = 7)
    val both = train.select("case_id").distinct()
      .join(test.select("case_id").distinct(), "case_id")
    assert(both.count() == 0L)
    assert(train.count() + test.count() == 10000L)
    // all 5 events of any case travel together
    assert(train.groupBy("case_id").count().filter(col("count") =!= 5).count() == 0L)
  }

  test("split: train ratio converges to target (split.rs:161-224)") {
    val cases = (1L to 20000L).toDF("case_id")
    for (ratio <- Seq(0, 330, 800, 1000); seed <- Seq(0L, 42L)) {
      val got = Split.assign(cases, "case_id", ratio, seed)
        .filter(col("is_train")).count().toDouble / 20000.0
      assert(math.abs(got - ratio / 1000.0) <= 0.015, s"ratio=$ratio seed=$seed got=$got")
    }
  }

  test("split: string case ids (XES concept:name) — no silent loss, case granularity") {
    // regression: pmod on a non-numeric key cast to double → NULL →
    // rows silently vanished from BOTH branches.
    val events = (1 to 500).flatMap(c => (0 until 3).map(i => (s"Case$c.0", i)))
      .toDF("case_id", "i")
    val (train, test) = Split.split(events, "case_id", 600, seed = 11)
    assert(train.count() + test.count() == 1500L)
    val both = train.select("case_id").distinct()
      .join(test.select("case_id").distinct(), "case_id")
    assert(both.count() == 0L)
    val ratio = train.select("case_id").distinct().count().toDouble / 500.0
    assert(math.abs(ratio - 0.6) < 0.1)
    // unsupported key type fails fast instead of silently dropping
    val bad = Seq((Array[Byte](1), 1)).toDF("case_id", "i")
    intercept[IllegalArgumentException] { Split.assign(bad, "case_id", 500, 1) }
  }

  test("split: leak-safe — exact duplicates never straddle the split") {
    // 400 distinct texts, each planted in 1-3 copies under DIFFERENT
    // doc ids; a per-id split would leak copies across branches, the
    // content-keyed split cannot.
    val docs = (1 to 400).flatMap { i =>
      val copies = 1 + i % 3
      (0 until copies).map(j => (i.toLong * 10 + j, s"document body $i  "))
    }.toDF("doc_id", "text")
    val got = Split.assignLeakSafe(docs, "text", 700, seed = 5)
    // same normalized content -> same cluster_key -> same branch
    val straddling = got.groupBy(lower(trim(col("text"))))
      .agg(countDistinct(col("is_train")).as("k"), countDistinct(col("cluster_key")).as("c"))
      .filter(col("k") =!= 1 || col("c") =!= 1)
    assert(straddling.count() == 0L)
    // and the ratio still converges at CLUSTER granularity
    val ratio = got.filter(col("is_train"))
      .select("cluster_key").distinct().count().toDouble / 400.0
    assert(math.abs(ratio - 0.7) < 0.08, s"got $ratio")
    // normalization: differing only by case/outer whitespace co-assigns
    val pair = Seq((1L, "Hello World"), (2L, "  hello world ")).toDF("doc_id", "text")
    val keys = Split.assignLeakSafe(pair, "text", 500, seed = 5)
      .select("cluster_key").as[Long].collect().toSet
    assert(keys.size == 1)
  }

  test("split: deterministic across partitionings") {
    val one = Split.assign((1L to 1000L).toDF("c").repartition(1), "c", 500, 9)
      .filter(col("is_train")).select("c").as[Long].collect().toSet
    val many = Split.assign((1L to 1000L).toDF("c").repartition(13), "c", 500, 9)
      .filter(col("is_train")).select("c").as[Long].collect().toSet
    assert(one == many)
  }

  test("dfg: edges, start activities, footprint on a known log") {
    // two cases: a->b->c and a->c->b  (textbook L-style)
    val events = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 4L), (2L, "c", 5L), (2L, "b", 6L)
    ).toDF("case", "act", "t").withColumn("ts", timestamp_micros(col("t")))
    val edges = Dfg.edges(events, "case", "act", "ts", "t")
      .as[(String, String, Long)].collect().toSet
    assert(edges == Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L), ("c", "b", 1L)))

    val starts = Dfg.startActivities(events, "case", "act", "ts", "t")
      .as[(String, Long)].collect().toSet
    assert(starts == Set(("a", 2L)))

    val ends = Dfg.endActivities(events, "case", "act", "ts", "t")
      .as[(String, Long)].collect().toSet
    assert(ends == Set(("c", 1L), ("b", 1L)))

    // eventually-follows: all later pairs, not just direct successors
    val ef = Dfg.eventuallyFollows(events, "case", "act", "ts", "t")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(ef == Map(("a", "b") -> 2L, ("a", "c") -> 2L,
      ("b", "c") -> 1L, ("c", "b") -> 1L))

    // heuristics-miner dependency: a>b unopposed = 1/2; b>c opposed by
    // c>b = 0 (Weijters formula)
    val dep = Dfg.dependencyMeasures(events, "case", "act", "ts", "t")
      .as[(String, String, Double)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    assert(dep(("a", "b")) == 0.5 && dep(("a", "c")) == 0.5)
    assert(dep(("b", "c")) == 0.0 && dep(("c", "b")) == 0.0)

    val fp = Dfg.footprint(events, "case", "act", "ts", "t")
      .as[(String, String, String)].collect()
      .map { case (x, y, r) => (x, y) -> r }.toMap
    assert(fp(("a", "b")) == "->" && fp(("b", "a")) == "<-")
    assert(fp(("b", "c")) == "||" && fp(("c", "b")) == "||") // both directions seen
    assert(fp(("a", "a")) == "#")
  }

  test("log stats: standalone events are total minus in-traces (stats.rs:70-110)") {
    val events = Seq(
      (Some(1L), "x"), (Some(1L), "y"), (Some(2L), "z"),
      (None, "s1"), (None, "s2")
    ).toDF("case_id", "act")
    val s = LogStats.collect(events, "case_id")
    assert(s.counts == Seq(2L, 3L, 5L))
    assert(s.standalone == 2L)
  }

  test("cnf: empty clause drops all; empty CNF keeps all; neg; dropErr (filter.rs:14-112)") {
    val df = Seq(("a", Some(1)), ("b", None)).toDF("k", "v")
    assert(df.filter(Cnf()).count() == 2L)
    assert(df.filter(Cnf.clause()).count() == 0L)
    assert(df.filter(Cnf(Seq(col("k") === "a"), Seq(col("v").isNotNull))).count() == 1L)
    assert(df.filter(Cnf.neg(col("k") === "a")).count() == 1L)
    // v > 0 is NULL for the None row: dropErr keeps the filter total
    assert(df.filter(Cnf.dropErr(col("v") > 0)).count() == 1L)
    assert(df.filter(Cnf.neg(Cnf.dropErr(col("v") > 0))).count() == 1L)
  }
}
