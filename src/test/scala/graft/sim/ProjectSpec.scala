package graft.sim

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.NativeExpressions

/** Random-projection features: structurally tied to the LSH family
  * (same planes, same fold), and actually distance-preserving enough
  * to be useful (JL floor on the real embeddings). */
class ProjectSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rp signs reproduce lshBucket table-0 bits exactly (same planes, same fold)") {
    val e = Tables(spark, sf, "embeddings")
    val planes = 8
    val mismatches = e.select(
        NativeExpressions.rpProject(col("embedding"), planes, 42L, 64).as("_rp"),
        NativeExpressions.lshBucket(col("embedding"), 0, planes, 42L, 64).as("_b"))
      .filter((0 until planes).map { p =>
        (element_at(col("_rp"), p + 1) > 0.0) =!=
          (shiftright(col("_b"), p).bitwiseAND(1) === 1)
      }.reduce(_ || _))
      .count()
    assert(mismatches == 0L)
  }

  test("JL floor: projected squared distances correlate with full-space on real pairs") {
    val e = Tables(spark, sf, "embeddings").limit(100)
      .select(col("vec_id"),
        col("embedding"),
        NativeExpressions.rpProject(col("embedding"), 8, 42L, 64).as("rp"))
      .cache()
    try {
      val rows = e.collect().map(r => (
        r.getAs[Seq[Float]]("embedding").toArray,
        r.getAs[Seq[Double]]("rp").toArray))
      val pairs = for (i <- rows.indices; j <- (i + 1) until rows.length if (i + j) % 7 == 0)
        yield (rows(i), rows(j))
      def d2f(a: Array[Float], b: Array[Float]) =
        a.indices.map(k => { val d = a(k) - b(k); d.toDouble * d }).sum
      def d2p(a: Array[Double], b: Array[Double]) =
        a.indices.map(k => { val d = a(k) - b(k); d * d }).sum
      // this corpus is near-isotropic (pairwise distances concentrate),
      // so rank correlation is vacuous; the JL property to pin is the
      // DISTORTION of each pair's ratio d2(proj)/d2(full). Weights are
      // ~uniform[-1,1] (variance 1/3), so E[ratio] = outDims/3 ≈ 2.67,
      // and an 8-dim chi²-like sum has cv ≈ sqrt(2/8) = 0.5.
      val ratios = pairs.map { case ((va, pa), (vb, pb)) =>
        d2p(pa, pb) / d2f(va, vb) }
      val n = ratios.length.toDouble
      val mean = ratios.sum / n
      val cv = math.sqrt(ratios.map(r => (r - mean) * (r - mean)).sum / n) / mean
      info(f"pairs=${pairs.length} meanRatio=$mean%.3f cv=$cv%.3f")
      assert(mean > 2.0 && mean < 3.4, f"mean distortion off: $mean%.3f (expect ~8/3)")
      assert(cv < 0.7, f"distortion too noisy: cv=$cv%.3f")
    } finally e.unpersist()
  }
}
