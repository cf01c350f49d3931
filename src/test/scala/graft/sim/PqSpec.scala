package graft.sim

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.NativeExpressions

/** Product quantization: encode (per-subspace L2 argmin) and ADC
  * scoring (cosine vs reconstruction through per-query tables), pinned
  * against naive Scala recomputation with the same fold orders. */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val M = 8
  private val Stride = 50

  private def naiveEncode(v: Array[Float], cbs: Array[Array[Array[Float]]]): Array[Int] =
    cbs.zipWithIndex.map { case (cb, mi) =>
      val sub = cb(0).length
      cb.zipWithIndex.map { case (c, k) =>
        var d = 0.0; var j = 0
        while (j < sub) {
          val diff = v(mi * sub + j).toDouble - c(j).toDouble
          d += diff * diff; j += 1
        }
        (d, k)
      }.minBy(identity)._2 // (dist, k) lexicographic: ties to smaller k
    }

  test("pqEncode: codes match the naive per-subspace L2 argmin, ties to smaller index") {
    val e = Tables(spark, sf, "embeddings")
    val cbs = Ann.pqCodebooks(e, "vec_id", "embedding", Stride, M)
    assert(cbs.length == M && cbs(0).nonEmpty && cbs(0)(0).length == 64 / M)
    val got = e.select(col("vec_id"),
        NativeExpressions.pqEncode(col("embedding"), cbs).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(vecs.nonEmpty)
    vecs.foreach { case (id, v) =>
      assert(got(id).sameElements(naiveEncode(v, cbs)), s"vec $id")
    }
  }

  test("ADC of a codeword vector against its own code is cosine 1") {
    val e = Tables(spark, sf, "embeddings")
    val probes = e.filter(col("vec_id") % Stride === 0)
    val res = Ann.pqTopK(e, probes, "vec_id", "embedding", k = 1,
      stride = Stride, m = M)
    // the nearest reconstruction to a codeword is itself — but rnk 1
    // excludes self, so instead check the raw score path: every probe's
    // own code reconstructs it exactly, so its cosine vs that
    // reconstruction is 1 within fp rounding
    val cbs = Ann.pqCodebooks(e, "vec_id", "embedding", Stride, M)
    val own = probes.select(col("vec_id"), col("embedding")).collect()
    own.foreach { case r =>
      val v = r.getSeq[Float](1).toArray
      val code = naiveEncode(v, cbs)
      val sub = 64 / M
      // reconstruction = the selected codewords; codeword k of subspace
      // m came from sampled vector k — for a sampled vector that is v
      // itself (L2 = 0), so recon == v and cos == 1
      val recon = code.zipWithIndex.flatMap { case (k, mi) => cbs(mi)(k) }
      assert(recon.sameElements(v), s"vec ${r.getLong(0)} not self-coded")
    }
    assert(res.count() > 0) // and the pipeline runs end to end
  }

  test("pqTopK: exactly k ranked rows per query, no self, deterministic") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val r1 = Ann.pqTopK(e, q, "vec_id", "embedding", k = 5,
      stride = Stride, m = M).collect()
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (idq, rows) =>
      assert(rows.length == 5, s"query $idq")
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to 5))
      assert(rows.forall(_.getLong(1) != idq))
    }
    val r2 = Ann.pqTopK(e, q, "vec_id", "embedding", k = 5,
      stride = Stride, m = M).collect()
    assert(r1.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }

  test("autoStride caps the codebook at maxK for any corpus size") {
    // the parameter-scaling rule: K = ceil(n/stride) ≤ maxK always
    Seq(1L, 100L, 500L, 10000L, 1000000L, 100000000000L).foreach { n =>
      val st = Ann.autoStride(n)
      assert(st >= 1)
      val k = math.ceil(n.toDouble / st)
      assert(k <= 256, s"n=$n stride=$st K=$k")
    }
    // the sf0.01 gate resolution pinned by the q_sim_topk_pq_auto oracle
    assert(Ann.autoStride(500) == 2)
  }

  test("pqTopKAuto == pqTopK at the count-derived stride") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val auto = Ann.pqTopKAuto(e, q, "vec_id", "embedding", k = 5, m = M)
      .collect().map(_.toString).sorted
    val st = Ann.autoStride(e.count())
    val fixed = Ann.pqTopK(e, q, "vec_id", "embedding", k = 5,
      stride = st, m = M).collect().map(_.toString).sorted
    assert(auto.sameElements(fixed))
    // K actually capped: the derived codebook has ≤ 256 codewords
    assert(Ann.pqCodebooks(e, "vec_id", "embedding", st, M)(0).length <= 256)
  }
}
