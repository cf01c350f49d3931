package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Recall@k of every approximate ANN path against the exact brute
  * force — the quality half of the ANN story (the plan half is
  * PlanShapeSpec/plan digests). All pipelines are deterministic, so
  * the measured values are stable; floors are set with margin below
  * the observed values to catch regressions, not to certify a score.
  */
class RecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val K = 5
  private val NQ = 10

  private def recallVsBrute(approx: DataFrame, brute: DataFrame): Double = {
    val hit = brute.select(col("id_q"), col("id_n"))
      .join(approx.select(col("id_q"), col("id_n")), Seq("id_q", "id_n"))
      .count()
    hit.toDouble / (NQ * K)
  }

  test("recall@5 vs brute: floors per method; k-means codebooks beat stride") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < NQ)
    val brute = Ann.bruteForceTopK(e, q, "vec_id", "embedding", K).cache()
    try {
      // planes sized to the corpus (load ~16) — fixed 8 planes on 500
      // vectors leaves ~2 per bucket and starves the candidate set
      val planes = Ann.autoPlanes(e.count(), 16)
      val lsh = recallVsBrute(
        Ann.lshTopK(e, q, "vec_id", "embedding", K, planesPerTable = planes), brute)
      val ivf = recallVsBrute(Ann.ivfTopK(e, q, "vec_id", "embedding", K), brute)
      val pqS = recallVsBrute(Ann.pqTopK(e, q, "vec_id", "embedding", K), brute)
      val cbsK = Ann.pqCodebooksKmeans(e, "vec_id", "embedding",
        stride = 50, m = 8, iters = 5)
      val pqK = recallVsBrute(
        Ann.pqTopKWith(e, q, "vec_id", "embedding", K, cbsK), brute)
      val ivfpq = recallVsBrute(
        Ann.ivfpqTopK(e, q, "vec_id", "embedding", K), brute)
      info(f"recall@5: lsh=$lsh%.2f ivf=$ivf%.2f pq(stride)=$pqS%.2f " +
        f"pq(kmeans)=$pqK%.2f ivfpq=$ivfpq%.2f")
      assert(lsh >= 0.15, s"lsh recall $lsh")
      assert(ivf >= 0.40, s"ivf recall $ivf")
      assert(pqS >= 0.05, s"pq stride recall $pqS")
      assert(pqK >= pqS, s"k-means codebooks ($pqK) should not lose to stride ($pqS)")
      assert(ivfpq >= 0.05, s"ivfpq recall $ivfpq")
    } finally brute.unpersist()
  }

  test("recall@10 IVF: k-means coarse centroids never lose to stride at equal C") {
    val K10 = 10
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < NQ)
    val brute = Ann.bruteForceTopK(e, q, "vec_id", "embedding", K10).cache()
    def recall(approx: DataFrame): Double =
      brute.select(col("id_q"), col("id_n"))
        .join(approx.select(col("id_q"), col("id_n")), Seq("id_q", "id_n"))
        .count().toDouble / (NQ * K10)
    try {
      // equal C = 10 cells on the 500-vector corpus; both quantizers
      // are seedless/deterministic, so these are stable measurements
      val (sIds, sCents) = Ann.ivfCentroids(e, "vec_id", "embedding", stride = 50)
      val rStride = recall(Ann.ivfTopKWith(e, q, "vec_id", "embedding",
        K10, sIds, sCents, nProbe = 3))
      val (kIds, kCents) = Kmeans.fit(e, "vec_id", "embedding",
        c = sIds.length, iters = 5, dims = 64)
      val rKmeans = recall(Ann.ivfTopKWith(e, q, "vec_id", "embedding",
        K10, kIds, kCents, nProbe = 3))
      info(f"ivf recall@10: stride=$rStride%.2f kmeans=$rKmeans%.2f")
      assert(rStride >= 0.30, s"stride ivf recall $rStride")
      assert(rKmeans >= rStride,
        s"k-means quantizer ($rKmeans) should not lose to stride ($rStride) at equal C")
    } finally brute.unpersist()
  }
}
