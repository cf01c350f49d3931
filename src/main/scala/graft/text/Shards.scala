package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Split

/** Training-shard export — the last stage of a data pipeline: assign
  * every document to one of `nShards` output shards deterministically
  * (portable key hash, [[Split.bucketN]] — same doc → same shard on
  * any cluster, any run, and in the SQL oracle), lay the data out one
  * directory per shard, and produce the manifest a training job reads.
  *
  * Hash sharding IS the "global shuffle" of training-data prep: a
  * reader consuming shards in any order sees documents in
  * hash-scattered order, with no corpus-wide sort. Per-shard doc
  * counts concentrate around n/nShards (multiplicative Chernoff
  * bounds at the scales involved), so shard files are naturally
  * sized; `maxRecordsPerFile` bounds individual files within a shard
  * if a hard cap is needed.
  *
  * Scale shape: assignment is a map-side hash; the write is one
  * exchange on the shard id (`repartition(nShards, shard)`) so each
  * shard directory is written by exactly one task — no tiny-file
  * explosion, no driver involvement; the manifest is one aggregation
  * over the shard key.
  */
object Shards {

  /** Adds the deterministic `shard` column. */
  def assign(docs: DataFrame, keyCol: String, nShards: Int, seed: Long): DataFrame =
    docs.withColumn("shard",
      Split.bucketN(Split.keyColumn(docs, keyCol), seed, nShards).cast("int"))

  /** Shard manifest: per shard, document count and payload units
    * (e.g. chars or tokens) — what a training job's data loader reads
    * to plan epochs. Every shard 0..nShards-1 with at least one doc
    * appears (hash spread makes empty shards vanishingly unlikely at
    * corpus scale; the gate pins the realized multiset either way). */
  def manifest(docs: DataFrame, keyCol: String, sizeCol: Column,
      nShards: Int, seed: Long): DataFrame =
    assign(docs, keyCol, nShards, seed)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).cast("long").as("n_units"))

  /** Deterministic training order: a seeded pseudo-random permutation
    * of the corpus as `(shard, pos)` — the order a data loader should
    * read documents in, reproducible on any cluster, any partitioning,
    * and in the SQL oracle. Shard assignment is [[assign]]'s portable
    * hash; WITHIN each shard, `pos` ranks by an independently-seeded
    * full-range hash ([[Split.hashP]], key tie-break), so consuming
    * shards in any order (or round-robin by `pos`) yields a
    * hash-scattered global order with no corpus-wide sort.
    *
    * Scale shape: one exchange on the shard id plus a per-shard
    * window sort — `nShards` is chosen so a shard fits a task (the
    * same sizing the shard WRITER already requires); never a
    * single-partition window.
    */
  def trainingOrder(docs: DataFrame, keyCol: String, nShards: Int,
      seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orderKey = Split.hashP(Split.keyColumn(docs, keyCol), seed + 1000003L)
    assign(docs, keyCol, nShards, seed)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(orderKey, col(keyCol))).cast("long") - 1L)
  }

  /** Writes `docs` as `outDir/shard=<k>/…parquet`, one writer task per
    * shard (single exchange on the shard id). Readers get per-shard
    * pruning via the partition column. */
  def write(docs: DataFrame, keyCol: String, nShards: Int, seed: Long,
      outDir: String): Unit =
    assign(docs, keyCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
