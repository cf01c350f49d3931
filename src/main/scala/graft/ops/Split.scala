package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test split + sampling at trace granularity — analogue of the
  * reference's `Split`/`Sample` (`/root/reference/src/stream/split.rs`).
  *
  * Reference semantics to preserve (split.rs:56-72): the split decision
  * is per *component* — a whole trace (all its events) goes to exactly
  * one branch, never split inside; Meta goes to both branches.
  *
  * The reference uses a seeded Pcg64 in stream order, which has no
  * stable distributed equivalent (SURVEY.md §7.4.5): Spark's
  * `randomSplit` is only deterministic for a fixed partitioning. We
  * instead derive the branch from a *deterministic arithmetic hash of
  * the case key* — reproducible across engines, partitionings, and
  * cluster sizes, and cheap (no shuffle at all: a map-side predicate).
  * The statistical guarantee (train fraction → ratio) is the same one
  * the reference tests (split.rs:161-224).
  */
object Split {

  /** Knuth multiplicative hash on the case key, mod 1000. Pure i64
    * arithmetic (every step < 2^63, reduced mod P=1e9+7) so an
    * external SQL oracle can replicate it exactly.
    *
    * The seed enters through the round-2 MULTIPLIER, not only
    * additively: an additive-only seed makes bucket(x, s2) an affine
    * shift of bucket(x, s1) mod 1000, i.e. two sampling operators with
    * different seeds would be perfectly correlated (a Sample(0.1)
    * feeding a Split(0.8) would route every survivor to one branch).
    */
  private val P = 1000000007L

  def bucket(caseId: Column, seed: Long): Column = bucketN(caseId, seed, 1000)

  /** [[bucket]] generalized to `n` buckets (shard assignment etc.);
    * permille splits are the n = 1000 case. */
  def bucketN(caseId: Column, seed: Long, n: Int): Column = {
    val a = (2 * seed + 40503L) % P
    val h1 = (pmod(caseId, lit(P)) + lit(seed % P)) * lit(2654435761L) % lit(P)
    val h2 = (h1 * lit(a) + lit(seed % P)) % lit(P)
    pmod(h2, lit(n))
  }

  /** The full-range two-step hash in [0, P) that [[bucketN]] reduces
    * mod n — exposed undivided as a deterministic pseudo-random ORDER
    * key (training-order permutation). Same integer arithmetic as the
    * SQL twin [[oracleHashPSql]]; every intermediate fits a BIGINT. */
  def hashP(caseId: Column, seed: Long): Column = {
    val a = (2 * seed + 40503L) % P
    val h1 = (pmod(caseId, lit(P)) + lit(seed % P)) * lit(2654435761L) % lit(P)
    (h1 * lit(a) + lit(seed % P)) % lit(P)
  }

  /** [[hashP]] in portable ANSI SQL. */
  def oracleHashPSql(caseCol: String, seed: Long): String = {
    val a = (2 * seed + 40503L) % P
    val x0 = s"((($caseCol % $P) + $P) % $P)"
    val h1 = s"((($x0 + ${seed % P}) * 2654435761) % $P)"
    s"((($h1 * $a) + ${seed % P}) % $P)"
  }

  /** Same arithmetic as [[bucket]] in portable ANSI SQL (for oracles). */
  def oracleBucketSql(caseCol: String, seed: Long): String =
    oracleBucketNSql(caseCol, seed, 1000)

  /** [[oracleBucketSql]] for [[bucketN]]. */
  def oracleBucketNSql(caseCol: String, seed: Long, n: Int): String = {
    val a = (2 * seed + 40503L) % P
    val x0 = s"((($caseCol % $P) + $P) % $P)"
    val h1 = s"((($x0 + ${seed % P}) * 2654435761) % $P)"
    val h2 = s"((($h1 * $a) + ${seed % P}) % $P)"
    s"((($h2 % $n) + $n) % $n)"
  }

  def oracleTrainPredicate(caseCol: String, trainPermille: Int, seed: Long): String =
    s"${oracleBucketSql(caseCol, seed)} < $trainPermille"

  /** Numeric view of the case key for [[bucket]]. [[bucket]]'s `pmod`
    * silently casts a non-numeric column to double → NULL → the row
    * would vanish from BOTH branches (total silent data loss, against
    * the every-trace-in-exactly-one-branch contract). So: numeric keys
    * pass through; string keys (e.g. XES `concept:name` ids) route
    * through the deterministic charHash (seed 7 — the same key
    * FlowRunner derives, and replicable in an oracle via
    * `Portable.charHashSql(col)` substituted into [[oracleBucketSql]]);
    * anything else fails fast.
    */
  private[graft] def keyColumn(events: DataFrame, caseCol: String): Column = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    events.schema(caseCol).dataType match {
      case _: NumericType => col(caseCol)
      case StringType => graft.functions.NativeExpressions.charHash(col(caseCol), 7L)
      case dt => throw new IllegalArgumentException(
        s"Split: case column '$caseCol' has unsupported type $dt — " +
          "use a numeric or string key")
    }
  }

  /** A permille fraction outside [0, 1000] silently yields an
    * all-train or all-test split — fail loudly instead (shared by all
    * three assign variants). */
  private def requirePermille(name: String, p: Int): Unit =
    require(p >= 0 && p <= 1000, s"$name must be in [0, 1000]: $p")

  /** Adds a deterministic `is_train` flag at case granularity. */
  def assign(events: DataFrame, caseCol: String, trainPermille: Int,
      seed: Long): DataFrame = {
    requirePermille("trainPermille", trainPermille)
    events.withColumn("is_train",
      bucket(keyColumn(events, caseCol), seed) < lit(trainPermille))
  }

  /** Three-way split at case granularity: adds a `split` column in
    * {train, val, test} from the same deterministic bucket —
    * bucket < trainPermille → train, < trainPermille+valPermille →
    * val, else test. The standard ML-pipeline extension of the
    * reference's two-way Split. */
  def assign3(events: DataFrame, caseCol: String, trainPermille: Int,
      valPermille: Int, seed: Long): DataFrame = {
    requirePermille("trainPermille", trainPermille)
    requirePermille("valPermille", valPermille)
    requirePermille("trainPermille + valPermille",
      trainPermille + valPermille)
    val b = bucket(keyColumn(events, caseCol), seed)
    events.withColumn("split",
      when(b < lit(trainPermille), lit("train"))
        .when(b < lit(trainPermille + valPermille), lit("val"))
        .otherwise(lit("test")))
  }

  /** Oracle SQL for [[assign3]]'s split column. */
  def oracleSplit3Sql(caseCol: String, trainPermille: Int, valPermille: Int,
      seed: Long): String = {
    val b = oracleBucketSql(caseCol, seed)
    s"CASE WHEN $b < $trainPermille THEN 'train' " +
      s"WHEN $b < ${trainPermille + valPermille} THEN 'val' ELSE 'test' END"
  }

  /** Leakage-safe document split: the unit of assignment is the
    * exact-duplicate CLUSTER, not the document. A plain per-id split
    * routes copies of the same text to different branches — the
    * classic train→test leak that inflates held-out metrics — so the
    * branch is derived from a hash of the NORMALIZED CONTENT
    * (lower(trim(text)), the [[graft.dedup.Dedup.exact]] cluster key):
    * duplicates co-assign by construction, with NO shuffle and no
    * cluster materialization — the whole operator is one map-side
    * codegen'd scan. Adds `cluster_key` (the content hash, shared by
    * all members of an exact-dup cluster) and `is_train`.
    *
    * Near-dup-safe variants plug in the same way: substitute any
    * deterministic per-cluster key (e.g. a
    * [[graft.dedup.Dedup.duplicateClusters]] canonical id) for the
    * content hash and bucket THAT — the co-assignment argument only
    * needs "same cluster ⇒ same key".
    */
  def assignLeakSafe(docs: DataFrame, textCol: String, trainPermille: Int,
      seed: Long): DataFrame = {
    requirePermille("trainPermille", trainPermille)
    docs
      .withColumn("cluster_key", graft.functions.NativeExpressions
        .charHash(lower(trim(col(textCol))), 7L))
      .withColumn("is_train",
        bucket(col("cluster_key"), seed) < lit(trainPermille))
  }

  /** The `Split` operator proper: (train, test) DataFrames. Both are
    * lazy views over the same scan — cache upstream if both sides are
    * consumed (the reference's Duplicator note, SURVEY.md §4).
    */
  def split(events: DataFrame, caseCol: String, trainPermille: Int,
      seed: Long): (DataFrame, DataFrame) = {
    val flagged = assign(events, caseCol, trainPermille, seed)
    (flagged.filter(col("is_train")).drop("is_train"),
     flagged.filter(!col("is_train")).drop("is_train"))
  }

  /** Stratified down-sampling to BALANCE strata: every stratum is
    * sampled at permille ⌊min_count·1000 / stratum_count⌋ with the
    * same deterministic key bucket, so the output has ≈ the smallest
    * stratum's size per stratum (the usual language/domain rebalance
    * before training). Two phases: a count aggregation (tiny result,
    * broadcast back), then one map-side filtered scan — no shuffle of
    * the data itself. */
  def stratifiedBalance(df: DataFrame, stratumCol: String, keyCol: String,
      seed: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    val target = counts.agg(min(col("_n")).as("_tgt"))
    val thresholds = counts.crossJoin(broadcast(target))
      .select(col(stratumCol),
        floor(col("_tgt") * lit(1000) / col("_n")).cast("long").as("_pm"))
    df.join(broadcast(thresholds), Seq(stratumCol))
      .filter(bucket(keyColumn(df, keyCol), seed) < col("_pm"))
      .drop("_pm")
  }

  /** `Sample` = Split with a Void test sink (split.rs:121-144). */
  def sample(events: DataFrame, caseCol: String, keepPermille: Int,
      seed: Long): DataFrame =
    split(events, caseCol, keepPermille, seed)._1
}
