package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation: two-stage salted groupBy for hot keys.
  *
  * At 100 TB a handful of hot keys (one mega-case, one viral document)
  * can pin a whole aggregation on one reducer. Salting splits each key
  * into `salts` sub-keys for the partial aggregate, then re-aggregates
  * the (tiny) salted partials — classic two-stage combine. Only
  * algebraic aggregates compose this way; this helper covers the
  * count/sum family (the min/max family needs no salting: their
  * partials never skew memory).
  *
  * AQE's skew-join handling (on in GraftSession) covers the join side;
  * this covers the agg side.
  */
object Skew {

  /** count(*) per key, salted. Result identical to
    * `df.groupBy(key).count()` for any salts >= 1. */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("count"))

  /** sum(valueCol) per key, salted. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("sum"))

  /** Skew-safe fact ⋈ dimension join: each fact row gets an arbitrary
    * salt in [0, salts); the dimension is replicated once per salt
    * value; the join key becomes (key, salt), so one hot key's fact
    * rows spread over `salts` reducers instead of melting one. The
    * result is identical to `fact.join(dim, key)` for any salt
    * assignment (every fact row meets exactly its key's replica) —
    * which is why the arbitrary per-row salt is safe here while it
    * never would be as an output column.
    *
    * Use when the dimension is too big to broadcast outright but
    * `salts × |dim|` still shuffles cheaply; for broadcast-sized dims
    * prefer `broadcast(dim)` (no salt needed), and for join skew that
    * AQE's OptimizeSkewedJoin already detects, prefer AQE — this is
    * the explicit-plan fallback for known-hot keys.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
      salts: Int): DataFrame = {
    val factS = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val dimS = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    factS.join(dimS, Seq(keyCol, "_salt")).drop("_salt")
  }
}
