package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Diversity sampling — greedy k-center (farthest-point) selection
  * over an embedding column: start from the smallest id, repeatedly
  * add the point FARTHEST (max-min cosine distance) from everything
  * selected so far, ties to the smaller id. The standard coreset /
  * "maximally diverse seed set" primitive of data-curation pipelines;
  * the classic 2-approximation of the k-center objective.
  *
  * Scale shape: k driver iterations, each ONE map-side corpus scan —
  * the selected vectors ride into the scan as literal arrays (k·dims
  * floats, centroid-table-sized), the per-row kernel is a fold over
  * them, and the argmax is a TakeOrdered(1) (per-partition top-1 +
  * driver merge, no shuffle of the corpus). Total work k·N·k·dims —
  * linear in the corpus for fixed k. Nothing corpus-sized is ever
  * collected.
  *
  * Determinism: distance = fl(1 − max cosine), and since fl(1−c) is
  * monotone in c, min-distance equals 1 − max-cosine exactly in IEEE —
  * the SQL oracle reproduces every selection and distance bit-for-bit.
  */
object Diversity {

  private def cosTo(vecCol: Column, v: Array[Float]): Column = {
    val litV = typedlit(v.toSeq)
    NativeExpressions.dotF(vecCol, litV) /
      (sqrt(NativeExpressions.dotF(vecCol, vecCol)) *
       sqrt(NativeExpressions.dotF(litV, litV)))
  }

  /** (rank, idCol, min_dist): the k selected points in selection
    * order; `min_dist` is the point's distance to the previously
    * selected set at selection time (NULL for the seed) — the running
    * coverage radius. */
  def kCenter(embs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the k iterations re-scan this input; cache it so a DERIVED input
    // (e.g. the dedup survivors in q_pipeline_vectors) computes its
    // upstream pipeline once, not once per iteration. All results are
    // driver-side rows, so the cache is released before returning.
    val base = embs.select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))
      .cache()
    try {
      val spark0 = embs.sparkSession
      import spark0.implicits._
      val seedOpt = base.orderBy(col("_id")).limit(1).collect().headOption
      if (seedOpt.isEmpty)
        return Seq.empty[(Int, Long, Option[Double])].toDF("rank", idCol, "min_dist")
      val seed = seedOpt.get
      var selected = Vector((seed.getLong(0), seed.getSeq[Float](1).toArray))
      var out = Vector[(Int, Long, Option[Double])]((1, seed.getLong(0), None))
      var exhausted = false
      while (selected.length < k && !exhausted) {
        val cosines = selected.map { case (_, v) => cosTo(col("_v"), v) }
        val dist = lit(1.0) -
          (if (cosines.length == 1) cosines.head else greatest(cosines: _*))
        val ids = selected.map(_._1)
        // fewer than k distinct ids in the input (e.g. dedup survivors
        // shrank below k): stop with what we have instead of head()-ing
        // an empty result
        base.filter(!col("_id").isin(ids: _*))
          .select(col("_id"), col("_v"), dist.as("_d"))
          .orderBy(col("_d").desc, col("_id").asc)
          .limit(1).collect().headOption match {
          case Some(next) =>
            selected :+= ((next.getLong(0), next.getSeq[Float](1).toArray))
            out :+= ((selected.length, next.getLong(0), Some(next.getDouble(2))))
          case None => exhausted = true
        }
      }
      out.map { case (r, id, d) => (r, id, d) }
        .toDF("rank", idCol, "min_dist")
    } finally base.unpersist()
  }
}
