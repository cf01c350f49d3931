package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Full-corpus k-NN graph: the scale-shaped [[Ann.knnGraph]] must
  * produce exactly what [[Ann.lshTopK]] with queries = corpus produces
  * (identical bucket candidates, identical cosine ranking) — the two
  * differ only in plan shape (bare-id candidate dedup + vector
  * join-back vs broadcast query carry). */
class KnnGraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("knnGraph equals lshTopK(corpus, corpus) row-for-row") {
    val e = Tables(spark, sf, "embeddings")
    val g = Ann.knnGraph(e, "vec_id", "embedding", 3)
    val ref = Ann.lshTopK(e, e, "vec_id", "embedding", 3)
    assert(g.count() > 0)
    assert(g.exceptAll(ref).count() == 0L)
    assert(ref.exceptAll(g).count() == 0L)
  }

  test("autoPlanes: constant bucket load as n grows; clamped; oracle pin") {
    // 2^planes ≈ n / targetLoad, so load stays ~targetLoad at any n
    assert(Ann.autoPlanes(500, 16) == 5)   // the sf0.01 gate value the
                                           // q_sim_knn_graph_auto oracle pins
    assert(Ann.autoPlanes(2000, 16) == 7)
    assert(Ann.autoPlanes(20000, 16) == 11)
    assert(Ann.autoPlanes(1, 16) == 2)     // lower clamp
    assert(Ann.autoPlanes(Long.MaxValue, 1) == 48) // upper clamp
  }

  test("knnGraphAuto equals knnGraphCentered with explicitly resolved params") {
    val e = Tables(spark, sf, "embeddings")
    val (n, c) = Ann.fixedPointCenter(e, "embedding", 64)
    val planes = Ann.autoPlanes(n, 16)
    val th = Ann.lshThresholds(c, tables = 4, planes, seed = 42L, dims = 64)
    val auto = Ann.knnGraphAuto(e, "vec_id", "embedding", 3, targetLoad = 16)
    val ref = Ann.knnGraphCentered(e, "vec_id", "embedding", 3,
      tables = 4, planes, seed = 42L, dims = 64, th)
    assert(auto.exceptAll(ref).count() == 0L)
    assert(ref.exceptAll(auto).count() == 0L)
  }

  test("centering: thresholds are the centroid's plane projections; zero center = plain LSH") {
    val e = Tables(spark, sf, "embeddings")
    val planes = Ann.autoPlanes(e.count(), 16)
    // with a zero centroid the thresholds are all zero and the
    // centered kernel must reproduce the origin-plane buckets exactly
    val zeroTh = Ann.lshThresholds(Array.fill(64)(0.0), 4, planes, 42L, 64)
    assert(zeroTh.forall(_ == 0.0))
    val plain = Ann.lshBuckets(e, "vec_id", "embedding", 4, planes, 42L, 64)
    val centered0 = Ann.lshBucketsCentered(e, "vec_id", "embedding",
      4, planes, 42L, 64, zeroTh)
    assert(plain.exceptAll(centered0).count() == 0L)
    assert(centered0.exceptAll(plain).count() == 0L)
  }

  test("centering armors off-center corpora: origin SRP degenerates on an all-positive shift") {
    // shift the corpus +2.0 per dim (an "all-positive embedding model"):
    // hyperplanes through the origin leave most vectors on the same
    // side of every plane, so buckets collapse; centroid-centered
    // planes keep splitting the bulk ~50/50 per bit
    val e = Tables(spark, sf, "embeddings")
    val shifted = e.withColumn("embedding",
      expr("transform(embedding, x -> x + CAST(2.0 AS FLOAT))"))
    val planes = Ann.autoPlanes(500, 16)
    def loadStats(b: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = b.groupBy("_table", "_bucket").count()
        .agg(max("count"), sum(col("count") * (col("count") - 1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (moShift, poShift) = loadStats(
      Ann.lshBuckets(shifted, "vec_id", "embedding", 4, planes, 42L, 64))
    val (n, c) = Ann.fixedPointCenter(shifted, "embedding", 64)
    assert(n == 500L)
    val th = Ann.lshThresholds(c, 4, planes, 42L, 64)
    val (mcShift, pcShift) = loadStats(Ann.lshBucketsCentered(
      shifted, "vec_id", "embedding", 4, planes, 42L, 64, th))
    info(s"origin: maxLoad=$moShift pairs=$poShift; " +
      s"centered: maxLoad=$mcShift pairs=$pcShift")
    // origin planes degenerate: the hottest bucket holds a large
    // constant fraction of the corpus, candidate-pair volume blows up
    assert(moShift > 2 * mcShift,
      s"origin maxLoad $moShift should dwarf centered $mcShift")
    assert(poShift > 4 * pcShift,
      s"origin pair volume $poShift should dwarf centered $pcShift")
  }

  test("knnGraph emits at most k directed neighbors per vector, no self-edges") {
    val e = Tables(spark, sf, "embeddings")
    val g = Ann.knnGraph(e, "vec_id", "embedding", 3).cache()
    try {
      assert(g.filter(col("id_q") === col("id_n")).count() == 0L)
      val maxDeg = g.groupBy("id_q").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(maxDeg <= 3L)
    } finally g.unpersist()
  }
}
