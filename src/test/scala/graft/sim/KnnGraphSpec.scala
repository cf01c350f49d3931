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
