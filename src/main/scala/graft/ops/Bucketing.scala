package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run exchange-free.
  *
  * At 100 TB the fact-to-fact join (lineitem ⋈ orders) is the dominant
  * shuffle; bucketing both sides by the join key at ingestion makes
  * every subsequent join on that key a zero-exchange SortMergeJoin —
  * the bucket spec IS the partitioning contract. (Spark buckets only
  * via saveAsTable — bucket metadata lives in the catalog.)
  */
object Bucketing {

  /** Writes `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True iff the executed plan of `df` contains no shuffle exchange —
    * the co-location check. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
