package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join — for every point, the intervals that
  * contain it (`start ≤ t ≤ end`) — the general range join the brief
  * names next to as-of (Spark's only native answer is a
  * BroadcastNestedLoopJoin or cartesian + filter, both quadratic).
  *
  * Scale shape: time is tiled into fixed buckets; every interval
  * explodes to the buckets it covers (rows ∝ span/bucket — linear in
  * total covered time), every point maps to one bucket, and the match
  * becomes an equi-join on the bucket id with a residual containment
  * filter. Pick `bucketUs` near the typical interval length: shorter
  * buckets inflate the interval expansion, longer ones inflate
  * per-bucket candidates.
  */
object RangeJoin {

  /** Count of containing intervals per point: `points(idCol, tsCol)` ×
    * `intervals(startCol, endCol)` → (idCol, n_containing). Points
    * contained by nothing are dropped (inner semantics), mirroring the
    * plain SQL `JOIN … ON t BETWEEN start AND end`. */
  def containmentCounts(points: DataFrame, intervals: DataFrame,
      idCol: String, tsCol: String, startCol: String, endCol: String,
      bucketUs: Long): DataFrame = {
    val p = points.select(col(idCol), col(tsCol).as("_t"))
      .withColumn("_b", floor(unix_micros(col("_t")) / bucketUs).cast("long"))
    val iv = intervals.select(col(startCol).as("_s"), col(endCol).as("_e"))
      .withColumn("_b", explode(sequence(
        floor(unix_micros(col("_s")) / bucketUs).cast("long"),
        floor(unix_micros(col("_e")) / bucketUs).cast("long"))))
    p.join(iv, Seq("_b"))
      .filter(col("_t") >= col("_s") && col("_t") <= col("_e"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_containing"))
  }
}
