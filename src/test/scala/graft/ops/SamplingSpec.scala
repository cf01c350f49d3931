package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** Sequential Poisson sampling: determinism, exact k, and the πps
  * contract (inclusion probability proportional to weight) checked
  * statistically over many seeds with the Scala-side replica of the
  * integer priority — which one test pins bit-equal to the Spark
  * expression first.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  /** Scala replica of ops/Sampling.priority (ihash i=0). */
  private def prio(id: Long, w: Long, seed: Long): Long = {
    val a = (Portable.Knuth * 1 + seed) % Portable.P
    val b = (Portable.Knuth * 7 + seed * 31) % Portable.P
    val h = (a * (id % Portable.P) + b) % Portable.P
    (h * Sampling.Scale) / w
  }

  test("Spark priority expression == Scala replica") {
    val df = (1L to 300L).map(i => (i, i % 17 + 3)).toDF("id", "w")
    val got = df.select(col("id"), col("w"),
        Sampling.priority("id", "w", 11L).as("p"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, w, p) => assert(p == prio(id, w, 11L), s"id=$id") }
  }

  test("exact k, deterministic, partitioning-independent") {
    val df = (1L to 500L).map(i => (i, (i % 10 + 1) * 10)).toDF("id", "w")
    val s1 = Sampling.sequentialPoisson(df, "id", "w", 50, 7L)
      .as[(Long, Long, Long)].collect().toSeq
    val s2 = Sampling.sequentialPoisson(df.repartition(13), "id", "w", 50, 7L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(s1.size == 50)
    assert(s1 == s2)
    // priorities ascending, ties broken by id
    assert(s1 == s1.sortBy(r => (r._3, r._1)))
  }

  test("non-positive weights are filtered, never a null priority") {
    // a zero/negative/null weight would be null priority in Spark
    // (non-ANSI div) but a division error in DuckDB — the enforced
    // weight >= 1 contract keeps both engines on defined inputs
    val df = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 20L))
      .toDF("id", "w")
    val got = Sampling.sequentialPoisson(df, "id", "w", 10, 3L)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(1L, 4L))
    assert(got.forall(_._3 >= 0L)) // defined, non-null priorities
    val grouped = Sampling.sequentialPoissonByGroup(
        df.withColumn("g", lit("x")), "g", "id", "w", k = 10, seed = 3L)
      .select("id").as[Long].collect().toSet
    assert(grouped == Set(1L, 4L))
  }

  test("two-stage group top-k == single-window group top-k") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 400L).map(i => (s"g${i % 3}", i, i % 13 + 5)).toDF("g", "id", "w")
    val twoStage = Sampling.sequentialPoissonByGroup(df, "g", "id", "w",
        k = 7, seed = 5L, salts = 8)
      .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
    val plain = df.select(col("g"), col("id"),
        Sampling.priority("id", "w", 5L).as("p"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("p"), col("id"))))
      .filter(col("rk") <= 7)
      .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
    assert(twoStage == plain)
    assert(plain.size == 21) // 3 groups x 7
  }

  test("inclusion probability is ~proportional to weight across seeds") {
    val n = 500
    val k = 50
    val weights = (1 to n).map(i => ((i % 10) + 1).toLong * 50L)
    val hits = Array.fill(10)(0) // per weight class (w/50 - 1)
    for (s <- 1L to 300L) {
      // seeds spread by a large prime: consecutive small seeds move
      // the ihash by only ~id per step, which would leave per-item
      // hashes nearly constant across the trial set
      val seed = s * 1000003L
      val chosen = (1 to n)
        .map(i => (prio(i.toLong, weights(i - 1), seed), i))
        .sorted.take(k)
      chosen.foreach { case (_, i) => hits(((weights(i - 1) / 50L) - 1L).toInt) += 1 }
    }
    // expected inclusion ∝ w: class 10 should see ~10× class 1.
    // 300 seeds × 50 picks: loose 2-sided bounds keep this stable.
    val lo = hits(0).toDouble
    val hi = hits(9).toDouble
    assert(lo > 0.0)
    val ratio = hi / lo
    assert(ratio > 6.0 && ratio < 14.0, s"ratio=$ratio hits=${hits.toSeq}")
    // monotone-ish overall: top half of the weight range beats bottom half
    assert(hits.drop(5).sum > hits.take(5).sum)
  }
}
