package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-scaled corpus mixture weights — the standard
  * multilingual/domain sampling scheme of large-scale pretraining
  * pipelines (weight group g by `p_g^α` renormalized, α ∈ [0,1]:
  * α = 1 keeps the natural distribution, α → 0 approaches uniform,
  * upsampling the tail groups).
  *
  * Output per group: raw counts, natural share `p`, mixture weight
  * `w = p^α / Σ_g p^α`, and `boost = w / p` (the per-document
  * sampling factor a sampler would apply).
  *
  * Scale shape: one partial-agg shuffle over the corpus to the
  * group profile; everything after runs on the alphabet-sized group
  * table (the single-partition window is over groups, never
  * documents — document this bound: groups = languages/domains,
  * dozens at most). FP determinism: the denominator folds the
  * SORTED weight list sequentially (`aggregate` ∘ `sort_array`), the
  * repo's standard both-sides-identical reduction order.
  */
object Mixture {

  def groupWeights(docs: DataFrame, groupCol: String, sizeCol: Column,
      alpha: Double): DataFrame = {
    val all = Window.partitionBy()
    docs
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).as("n_units"))
      .withColumn("p",
        col("n_units").cast("double") /
          sum(col("n_units")).over(all).cast("double"))
      // sqrt is IEEE-correctly-rounded in every engine; pow is only
      // 1-ulp-accurate and may differ across libm implementations —
      // so the common α = 0.5 stays bit-portable to the SQL oracle
      .withColumn("_pa",
        if (alpha == 0.5) sqrt(col("p")) else pow(col("p"), lit(alpha)))
      .withColumn("_denom",
        aggregate(sort_array(collect_list(col("_pa")).over(all)),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("w", col("_pa") / col("_denom"))
      .withColumn("boost", col("w") / col("p"))
      .drop("_pa", "_denom")
  }

  /** Deterministic budget-driven sampler on top of [[groupWeights]]:
    * target units for group g = w_g · `budgetUnits`; per-group keep
    * rate = min(1, target / n_units_g), quantized to permille and
    * applied via the repo's portable key-hash bucket
    * ([[graft.ops.Split.bucket]]) — so the same document set is
    * selected on any cluster, on re-runs, and by the SQL oracle.
    * Output per group: the applied rate and realized kept doc/unit
    * counts; groups whose rate rounds to 0 permille drop out (inner
    * semantics).
    *
    * Scale shape: one group-profile shuffle (inside groupWeights) + a
    * broadcast of the alphabet-sized rate table; the selection itself
    * is a map-side hash filter, then one aggregation shuffle on the
    * group key. No sort, no global sample(). */
  def sampleToBudget(docs: DataFrame, groupCol: String, sizeCol: Column,
      keyCol: String, budgetUnits: Long, alpha: Double, seed: Long): DataFrame = {
    val rates = groupWeights(docs, groupCol, sizeCol, alpha)
      .select(col("grp"),
        least(lit(1000L),
          floor(col("w") * lit(budgetUnits.toDouble)
            / col("n_units").cast("double") * lit(1000.0))).cast("int").as("rate_pm"))
    docs.join(broadcast(rates), docs(groupCol) === rates("grp"))
      .filter(graft.ops.Split.bucket(
        graft.ops.Split.keyColumn(docs, keyCol), seed) < col("rate_pm"))
      .groupBy(col(groupCol), col("rate_pm"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(sizeCol).cast("long").as("n_units_kept"))
  }
}
