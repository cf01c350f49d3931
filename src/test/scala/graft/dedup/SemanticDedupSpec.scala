package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sim.Ann

/** SemDeDup semantic dedup vs an independent naive reference computed
  * driver-side from collected vectors: identical cell assignment
  * (argmax cosine, ties to the smaller centroid id) and identical
  * keep/drop decisions (drop iff a smaller-id same-cell neighbor at
  * cos >= tau exists). */
class SemanticDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Tau = 0.4

  test("keep/drop decisions match the naive within-cell reference") {
    val e = Tables(spark, sf, "embeddings")
    val (cids, cvecs) = Ann.ivfCentroids(e, "vec_id", "embedding", 50)
    val got = Dedup.semantic(e, "vec_id", "embedding", cids, cvecs, Tau)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cell = vecs.map { case (id, v) =>
      id -> cids.zip(cvecs).maxBy { case (cid, cv) => (cos(v, cv), -cid) }._1
    }.toMap
    val byId = vecs.toMap
    vecs.foreach { case (id, v) =>
      val naiveDrop = vecs.exists { case (other, _) =>
        other < id && cell(other) == cell(id) && cos(byId(other), v) >= Tau
      }
      assert(got(id)._1 == cell(id), s"cell of $id")
      assert(got(id)._2 == !naiveDrop, s"keep of $id")
    }
    // and the survivor set is an independent set: if cos(i,j) >= tau
    // with i < j in one cell, j is dropped by the rule — so no two
    // kept vectors in a cell are near-dups
    val kept = got.filter(_._2._2).keys.toSeq.sorted
    for (i <- kept; j <- kept if i < j && cell(i) == cell(j))
      assert(cos(byId(i), byId(j)) < Tau, s"kept near-dups $i,$j")
  }
}
