package graft.sim

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** int8 quantization: code range, round-trip error bound, zero-vector
  * edge, and a recall floor for searching on the codes directly. */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("codes in [-127,127]; |x - q*scale| < scale per dim; zero vector -> zeros") {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .unionByName(Seq((999999L, Array.fill(64)(0.0f).toSeq))
        .toDF("vec_id", "embedding"))
    val rows = Quantize.int8(e, "vec_id", "embedding")
      .join(e, "vec_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val v = r.getSeq[Float](3)
      assert(q.forall(c => c >= -127 && c <= 127), s"vec ${r.getLong(0)}")
      if (r.getLong(0) == 999999L) {
        assert(scale == 0.0 && q.forall(_ == 0))
      } else {
        assert(scale > 0.0)
        v.zip(q).foreach { case (x, c) =>
          // trunc(x/scale) is within 1 unit: |x - c*scale| < scale
          assert(math.abs(x.toDouble - c * scale) < scale + 1e-12,
            s"vec ${r.getLong(0)}: x=$x c=$c scale=$scale")
        }
      }
    }
  }

  test("searching on int8 codes keeps recall@5 vs exact float brute force") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // quantize corpus AND queries, score cosine on the codes
    val coded = Quantize.int8(e, "vec_id", "embedding")
      .select(col("vec_id"), col("q").cast("array<float>").as("embedding"))
    val approx = Ann.bruteForceTopK(coded,
        coded.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall@5 = $recall")
  }
}
