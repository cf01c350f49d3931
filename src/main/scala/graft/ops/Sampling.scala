package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Deterministic weighted sampling without replacement — sequential
  * Poisson sampling (Ohlsson 1998, the πps scheme used by official
  * statistics offices): draw u_i uniform per item, order by u_i / w_i
  * ascending, take k. In the small-sampling-fraction regime
  * P(u_i/w_i < t) = t·w_i, so inclusion probability is exactly
  * proportional to weight; here u_i is the repo's portable integer
  * hash of the item id, which makes the sample a pure function of
  * (ids, weights, seed) — the same k documents are selected on any
  * cluster, any partitioning, any engine.
  *
  * The reference's sampler is split.rs's uniform case split
  * (`/root/reference/src/stream/split.rs:18-147`, here `ops/Split`);
  * this extends the same hash-bucket determinism contract to
  * weight-proportional selection (the "sample big docs more" face of
  * corpus curation).
  *
  * Scale shape: the priority is map-side arithmetic on codegen'd
  * builtins; top-k is `TakeOrdered` (per-partition heaps + driver
  * merge of k·partitions rows) — zero shuffle, no global sort. The
  * integer ratio ⌊h·10^6 / w⌋ stays below 2^51 for h < P ≈ 1e9 and
  * w ≥ 1, and ties (same floored priority) break on the id.
  */
object Sampling {

  val Scale = 1000000L

  /** Priority: ⌊ihash(id) · 10^6 div weight⌋ (smaller = keep).
    * Built from [[Portable.ihashSql]]'s text — plain integer
    * arithmetic that parses identically in Spark SQL and DuckDB —
    * with `div` (exact i64 division; the Column-level `/` would
    * promote to double and risk an off-by-one floor vs the oracle's
    * integer `//`). */
  def priority(idExpr: String, weightExpr: String, seed: Long): Column =
    expr(s"CAST((${Portable.ihashSql(idExpr, 0, seed)} * $Scale) " +
      s"div ($weightExpr) AS BIGINT)")

  /** Top-k by weight-scaled hash priority. `weightCol` must be a
    * positive integral column — ENFORCED by a `weight >= 1` filter
    * (a zero/negative/null weight would yield a null priority under
    * Spark's non-ANSI div but a division-by-zero error in DuckDB,
    * silently breaking engine parity; mirror the same predicate in
    * any oracle SQL). Output: (idCol, weightCol, priority),
    * priority ascending, id-tiebroken. */
  def sequentialPoisson(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame =
    df.filter(col(weightCol) >= 1)
      .select(col(idCol), col(weightCol),
        priority(idCol, weightCol, seed).as("priority"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)

  /** DuckDB-dialect SQL of [[priority]]. */
  def prioritySql(id: String, weight: String, seed: Long): String =
    s"((${Portable.ihashSql(id, 0, seed)} * $Scale) // ($weight))"

  /** Stratified πps: per-group top-k by the same priority, computed in
    * TWO stages — per (group, salt) partial top-k, then per-group
    * final top-k over ≤ salts·k survivors. Exact (the group top-k is
    * a subset of the per-salt top-ks), and the reason it exists: a
    * single-window `partitionBy(group)` puts a whole group's rows on
    * one reducer, which melts when groups are few and huge (5
    * languages × 20 TB each). Stage 1 spreads each group over `salts`
    * reducers; stage 2 sorts only salts·k rows per group.
    *
    * Output: (groupCol, idCol, weightCol, priority, rk), rk = 1..k
    * per group.
    */
  def sequentialPoissonByGroup(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, k: Int, seed: Long,
      salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same positive-weight contract as sequentialPoisson, enforced
    val pr = df.filter(col(weightCol) >= 1)
      .select(col(groupCol), col(idCol), col(weightCol),
        priority(idCol, weightCol, seed).as("priority"))
      .withColumn("_salt", pmod(col(idCol).cast("long"), lit(salts.toLong)))
    val w1 = Window.partitionBy(col(groupCol), col("_salt"))
      .orderBy(col("priority"), col(idCol))
    val survivors = pr.withColumn("_r", row_number().over(w1))
      .filter(col("_r") <= k).drop("_r", "_salt")
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(col("priority"), col(idCol))
    survivors.withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
  }
}
