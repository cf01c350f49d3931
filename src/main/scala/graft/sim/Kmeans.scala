package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded Lloyd's iterations for the IVF coarse quantizer
  * (reference surface: the ANN/similarity family SURVEY.md §2.9/§6
  * names; the stride sample in [[Ann.ivfCentroids]] is the
  * oracle-friendly default, this is the recall path for clustered
  * data).
  *
  * Scale shape per iteration: assignment is the SAME zero-shuffle
  * [[Ann.ivfAssignments]] scan used at query time (centroids ride as a
  * codegen reference object), and the re-centering is one
  * `groupBy(_cid)` with per-dimension `sum` columns — partial
  * aggregation map-side, so the only exchange moves C rows of partial
  * sums (C = quantizer size, never corpus-scale). The corpus is
  * scanned `iters` times; nothing corpus-sized is collected or
  * broadcast.
  */
object Kmeans {

  /** Fit `c` centroids with `iters` Lloyd's rounds. Init is the
    * deterministic stride sample (same as [[Ann.ivfCentroids]]), so
    * the whole fit is seedless and reproducible. Returns ascending
    * centroid labels 0..c-1 and their vectors — the tie contract
    * [[graft.functions.Native.ivfAssign]] requires. Empty cells keep
    * their previous centroid.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, c: Int,
      iters: Int, dims: Int): (Array[Long], Array[Array[Float]]) = {
    val n = corpus.count()
    val stride = math.max(1L, n / c)
    val init = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol)).limit(c)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    val ids = Array.tabulate(init.length)(_.toLong)
    var cents = init
    val sums = (1 to dims).map(i =>
      sum(element_at(col("_vn"), i).cast("double")).as(s"_s$i"))
    for (_ <- 1 to iters) {
      val rows = Ann.ivfAssignments(corpus, idCol, vecCol, ids, cents)
        .groupBy("_cid")
        .agg(count(lit(1)).as("_n"), sums: _*)
        .collect()
      val byCid = rows.map(r => r.getLong(0) -> r).toMap
      cents = ids.map { id =>
        byCid.get(id).map { r =>
          val cnt = r.getLong(1).toDouble
          Array.tabulate(dims)(d => (r.getDouble(d + 2) / cnt).toFloat)
        }.getOrElse(cents(id.toInt))
      }
    }
    (ids, cents)
  }
}
