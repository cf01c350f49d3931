package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-point mining: at each branching activity of the DFG, how
  * the outgoing branch correlates with an event attribute — the
  * "why did the case go this way" analysis layered on discovery
  * (complements [[Dfg]] the way decision miners complement control
  * flow in every process-mining suite).
  *
  * Per (act_from, act_to) branch:
  *  - `n`, `p_branch` — branch frequency and probability among
  *    act_from's outgoing edges;
  *  - exact-integer attribute profile of the SOURCE event
  *    (`sum_attr`/`n_attr`/`min_attr`/`max_attr`) — the per-branch
  *    attribute signature (means are a downstream division);
  *  - per act_from: `gini` — branch impurity `1 − Σ p²`, computed as
  *    `1 − Σ n_b² / N²` in exact Longs with one final division, so
  *    every number in the result is bit-stable under any aggregation
  *    order (no transcendentals, no FP accumulation).
  *
  * Scale shape: identical to [[Dfg.edges]] — one case-key window
  * shuffle, then alphabet²-sized rollups with a window over act_from
  * (at most |A| rows per partition).
  */
object Decision {

  /** `(act_from, act_to, n, p_branch, gini, sum_attr, n_attr,
    * min_attr, max_attr)` — `attr` must be an integral column (exact
    * arithmetic is the determinism contract).
    */
  def branchProfiles(events: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String,
      attr: Column): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieBreak))
    val edges = events
      .select(col(caseCol), col(activityCol), col(tsCol), col(tieBreak),
        attr.cast("long").as("_attr"))
      .withColumn("act_to", lead(col(activityCol), 1).over(w))
      .filter(col("act_to").isNotNull)
      .groupBy(col(activityCol).as("act_from"), col("act_to"))
      .agg(count(lit(1)).as("n"),
        sum("_attr").as("sum_attr"), count(col("_attr")).as("n_attr"),
        min("_attr").as("min_attr"), max("_attr").as("max_attr"))

    val wFrom = Window.partitionBy(col("act_from"))
    edges
      .withColumn("_nTot", sum(col("n")).over(wFrom))
      .withColumn("_ss", sum(col("n") * col("n")).over(wFrom))
      .select(col("act_from"), col("act_to"), col("n"),
        (col("n").cast("double") / col("_nTot").cast("double"))
          .as("p_branch"),
        (lit(1.0) - col("_ss").cast("double") /
          (col("_nTot") * col("_nTot")).cast("double")).as("gini"),
        col("sum_attr"), col("n_attr"), col("min_attr"), col("max_attr"))
  }
}
