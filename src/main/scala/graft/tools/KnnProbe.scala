package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.sim.Ann

/** One-off diagnostic for the kNN-graph scale story: candidate-pair
  * volume and bucket-load tails at two scale points, to separate "the
  * candidate set grew super-linearly" (an algorithmic defect) from
  * "constant-factor degradation on fixed cores" (a box artifact).
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    for (dir <- args) {
      val e = Tables(spark, dir, "embeddings")
      val n = e.count()
      val planes = Ann.autoPlanes(n, 16)
      def stats(b: org.apache.spark.sql.DataFrame, label: String): Unit = {
        val loads = b.select(col("vec_id").as("_id"), col("_table"), col("_bucket"))
          .groupBy("_table", "_bucket").count()
        val r = loads.agg(count(lit(1)).as("buckets"),
          max(col("count")).as("maxLoad"),
          sum(col("count") * (col("count") - 1)).as("directedPairs")).head()
        println(s"PROBE dir=$dir kind=$label n=$n planes=$planes " +
          s"buckets=${r.getLong(0)} maxLoad=${r.getLong(1)} directedPairs=${r.getLong(2)}")
      }
      stats(Ann.lshBuckets(e, "vec_id", "embedding", tables = 4,
        planesPerTable = planes, seed = 42L, dims = 64), "origin")
      val (_, c) = Ann.fixedPointCenter(e, "embedding", 64)
      val th = Ann.lshThresholds(c, 4, planes, 42L, 64)
      stats(Ann.lshBucketsCentered(e, "vec_id", "embedding", 4, planes,
        42L, 64, th), "centered")
    }
    spark.stop()
  }
}
