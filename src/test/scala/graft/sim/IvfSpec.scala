package graft.sim

import graft.{SparkSpec, Tables}
import graft.functions.NativeExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The map-side IVF kernels ([[graft.functions.Native.ivfAssign]] /
  * `ivfProbes`) must be value-identical to the declarative
  * crossJoin+window argmax they replaced — same double arithmetic,
  * same (cos desc, id asc) tie handling — and the k-means quantizer
  * must not lose recall vs the stride sample.
  */
class IvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Dims = 64

  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    NativeExpressions.dotF(a, b) /
      (sqrt(NativeExpressions.dotF(a, a)) * sqrt(NativeExpressions.dotF(b, b)))

  /** The former plan shape: corpus×centroids expansion through a
    * row_number window — kept here as the executable specification of
    * the assignment semantics. */
  private def windowAssignments(corpus: DataFrame, stride: Int): DataFrame = {
    val cents = corpus.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("_cid"), col("embedding").as("_cv"))
    val w = Window.partitionBy(col("id_n"))
      .orderBy(col("_ccos").desc, col("_cid").asc)
    corpus.select(col("vec_id").as("id_n"), col("embedding").as("_vn"))
      .crossJoin(broadcast(cents))
      .withColumn("_ccos", cosine(col("_vn"), col("_cv")))
      .withColumn("_crn", row_number().over(w))
      .filter(col("_crn") === 1)
      .select(col("id_n"), col("_cid").cast("long").as("_cid"))
  }

  test("map-side assignment equals the crossJoin+window argmax row-for-row") {
    val e = Tables(spark, sf, "embeddings")
    val (ids, cents) = Ann.ivfCentroids(e, "vec_id", "embedding", 50)
    val fast = Ann.ivfAssignments(e, "vec_id", "embedding", ids, cents)
      .select("id_n", "_cid")
    val ref = windowAssignments(e, 50)
    assert(fast.count() === e.count())
    assert(fast.exceptAll(ref).count() === 0L)
    assert(ref.exceptAll(fast).count() === 0L)
  }

  test("probe selection equals the window top-nProbe (order preserved)") {
    val e = Tables(spark, sf, "embeddings")
    val (ids, cents) = Ann.ivfCentroids(e, "vec_id", "embedding", 50)
    val queries = e.filter(col("vec_id") < 10)
    val fast = queries.select(col("vec_id").as("id_q"),
        posexplode(NativeExpressions.ivfProbes(col("embedding"), ids, cents, 3))
          .as(Seq("_ord", "_cid")))
    val cents2 = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("_cid"), col("embedding").as("_cv"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("_ccos").desc, col("_cid").asc)
    val ref = queries.select(col("vec_id").as("id_q"), col("embedding").as("_vq"))
      .crossJoin(broadcast(cents2))
      .withColumn("_ccos", cosine(col("_vq"), col("_cv")))
      .withColumn("_crn", row_number().over(w))
      .filter(col("_crn") <= 3)
      .select(col("id_q"), (col("_crn") - 1).cast("int").as("_ord"),
        col("_cid").cast("long").as("_cid"))
    assert(fast.exceptAll(ref).count() === 0L)
    assert(ref.exceptAll(fast).count() === 0L)
  }

  test("k-means centroids match or beat stride-sample recall@5 vs brute force") {
    val e = Tables(spark, sf, "embeddings").cache()
    try {
      val q = e.filter(col("vec_id") < 20)
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select("id_q", "id_n").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5))
      val stride = {
        val (ids, cents) = Ann.ivfCentroids(e, "vec_id", "embedding", 50)
        pairs(Ann.ivfTopKWith(e, q, "vec_id", "embedding", 5, ids, cents, 3))
      }
      val kmeans = {
        val (ids, cents) = Kmeans.fit(e, "vec_id", "embedding",
          c = 20, iters = 4, dims = Dims)
        pairs(Ann.ivfTopKWith(e, q, "vec_id", "embedding", 5, ids, cents, 3))
      }
      val rStride = stride.intersect(exact).size.toDouble / exact.size
      val rKmeans = kmeans.intersect(exact).size.toDouble / exact.size
      info(f"recall@5: stride=$rStride%.3f kmeans=$rKmeans%.3f")
      assert(rKmeans >= rStride - 0.05,
        f"k-means recall $rKmeans%.3f worse than stride $rStride%.3f")
      assert(rKmeans > 0.0)
    } finally e.unpersist()
  }
}
