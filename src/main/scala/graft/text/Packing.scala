package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining — the concat-and-chunk layout:
  * documents are laid out in a deterministic order (ascending id) into
  * one global token stream, which is then cut into fixed `seqLen`
  * training sequences. Each doc's placement is a pure function of the
  * EXACT global prefix sum of token counts, so the layout is
  * reproducible from the table alone (no packing state to store).
  *
  * Scale shape — the distributed prefix-sum pattern (same as
  * [[graft.ops.RangeJoin]]'s rank): a global `sum() OVER (ORDER BY
  * id)` would funnel every row through ONE partition, so the cumsum
  * is split into an id-range-bucketed within-bucket window (one
  * exchange, partitions balanced by bucket) plus a bucket-level
  * offset cumsum — one row per occupied bucket, broadcast back.
  * Bucket count is bounded by construction (ids/bucketWidth), the
  * same contract [[graft.ops.RangeJoin.autoBucketUs]] derives.
  *
  * Output per doc: `tok_start` (global stream offset), `bin_first` /
  * `bin_last` (the training sequences the doc lands in), `n_chunks`
  * (how many sequences it straddles). Zero-token docs occupy no
  * stream space: they report the bin they'd start in and 0 chunks.
  */
object Packing {

  /** Lay out docs (ordered by `idCol` ascending) into `seqLen`-token
    * sequences. `tokensCol` must be a non-negative token count.
    *
    * Caller contract on `bucketWidth`: the bucket-offset cumsum has
    * one row per occupied id-range bucket, runs in a single-partition
    * window, and is broadcast — id-range / bucketWidth must stay
    * driver-small. A fixed width under a growing id range silently
    * breaks that; derive it from the observed range ([[packAuto]])
    * unless the range is fixed by construction. */
  def pack(docs: DataFrame, idCol: String, tokensCol: Column,
      seqLen: Long, bucketWidth: Long = 100000L): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val base = docs.select(col(idCol).cast("long").as("_id"),
      tokensCol.cast("long").as("_n"))
    val bucketed = base.withColumn("_b", floor(col("_id") / bucketWidth))
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = bucketed.withColumn("_pre", coalesce(sum(col("_n")).over(wIn), lit(0L)))
    val wB = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per occupied bucket — bounded, broadcastable
    val offsets = bucketed.groupBy(col("_b")).agg(sum(col("_n")).as("_bn"))
      .withColumn("_off", coalesce(sum(col("_bn")).over(wB), lit(0L)))
      .select(col("_b"), col("_off"))
    within.join(broadcast(offsets), Seq("_b"))
      .withColumn("tok_start", col("_pre") + col("_off"))
      .withColumn("bin_first", floor(col("tok_start") / seqLen).cast("long"))
      .withColumn("bin_last",
        when(col("_n") > 0,
          floor((col("tok_start") + col("_n") - 1) / seqLen).cast("long"))
          .otherwise(col("bin_first")))
      .withColumn("n_chunks",
        when(col("_n") > 0, col("bin_last") - col("bin_first") + 1L)
          .otherwise(lit(0L)))
      .select(col("_id").as(idCol), col("_n").as("n_tokens"),
        col("tok_start"), col("bin_first"), col("bin_last"), col("n_chunks"))
  }

  /** [[pack]] with the bucket width derived from the observed id range
    * (one cheap min/max agg job) so the offset cumsum is at most
    * `targetBuckets` rows at any id scale — the same count-derived
    * sizing as [[graft.ops.RangeJoin.autoBucketUs]]. The result is
    * bucket-width-invariant (PackingSpec proves it across widths), so
    * this only changes the plan's constant, never the layout. */
  def packAuto(docs: DataFrame, idCol: String, tokensCol: Column,
      seqLen: Long, targetBuckets: Int = 4096): DataFrame = {
    val r = docs.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).head()
    val width =
      if (r.isNullAt(0)) 1L
      else math.max(1L, (r.getLong(1) - r.getLong(0)) / targetBuckets + 1L)
    pack(docs, idCol, tokensCol, seqLen, width)
  }
}
