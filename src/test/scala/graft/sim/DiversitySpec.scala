package graft.sim

import graft.{SparkSpec, Tables}

/** Greedy k-center vs a sequential reference, plus the diversity
  * property the op exists for. */
class DiversitySpec extends SparkSpec {

  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  private def naive(vecs: Seq[(Long, Array[Float])], k: Int)
      : Seq[(Int, Long, Option[Double])] = {
    var selected = Vector(vecs.minBy(_._1))
    var out = Vector((1, selected.head._1, Option.empty[Double]))
    while (selected.length < k) {
      val next = vecs.filterNot(v => selected.exists(_._1 == v._1))
        .map { case (id, v) =>
          (id, v, 1.0 - selected.map(s => cos(v, s._2)).max) }
        .minBy { case (id, _, d) => (-d, id) } // max dist, ties min id
      selected :+= ((next._1, next._2))
      out :+= ((selected.length, next._1, Some(next._3)))
    }
    out
  }

  test("selection order and distances match the sequential greedy on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    val got = Diversity.kCenter(e, "vec_id", "embedding", k = 6).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq.sortBy(_._1)
    assert(got == naive(vecs, 6))
  }

  test("coverage radius is non-increasing and the selection is diverse") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Diversity.kCenter(e, "vec_id", "embedding", k = 6).collect()
      .sortBy(_.getInt(0))
    val dists = got.drop(1).map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => b <= a + 1e-12 },
      dists.mkString(","))
    assert(got.map(_.getLong(1)).distinct.length == 6)
  }

  test("fewer than k distinct rows: returns all rows selected so far, no throw") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .orderBy("vec_id").limit(3)
    val got = Diversity.kCenter(e, "vec_id", "embedding", k = 10).collect()
    assert(got.length == 3, got.mkString(","))
    assert(got.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("empty input: empty result, no throw") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .filter("vec_id < 0")
    assert(Diversity.kCenter(e, "vec_id", "embedding", k = 4).count() == 0L)
  }
}
