package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concept-drift detection over an event stream: how far each time
  * period's activity mix strays from the whole log's — the
  * log-comparison primitive behind drift dashboards (complements the
  * reference's single-log Statistics, `stats.rs:63-141`).
  *
  * Per period `t` (a `date_trunc` bucket of the timestamp) the score is
  * the L1 (total-variation×2) distance between the period's activity
  * distribution and the global one:
  *
  *   L1(t) = Σ_a | n_{t,a}/N_t − g_a/G |
  *
  * computed as `Σ_a |n_{t,a}·G − g_a·N_t|` in EXACT Long arithmetic
  * with ONE final division by `N_t·G` — no floating-point accumulation,
  * so the result is bit-stable under any aggregation order (the same
  * trick as the fold-digest kernels; Long overflow needs
  * N_event·N_period_event &gt; 2⁶³, i.e. ~3·10⁹ events in both factors,
  * beyond which pre-scaling per shard applies).
  *
  * Scale shape: two alphabet×period-sized aggregates off one scan
  * (partial map-side combine), a broadcast join of the global profile,
  * and an integer rollup per period. No per-event shuffle at all —
  * the groupBy keys (period, activity) are low-cardinality.
  */
object Drift {

  /** Per-period drift table:
    * `(period, n_events, l1_x2_vs_global)` — `l1_x2_vs_global` ∈ [0,2),
    * 0 = identical mix; the supremum for a period holding fraction `w`
    * of the global mass is `2(1−w)` (the global profile contains the
    * period itself, so a period can never be fully disjoint from it).
    */
  def activityDrift(events: DataFrame, activityCol: String, tsCol: String,
      granularity: String = "week"): DataFrame = {
    val bucketed = events.select(
      date_trunc(granularity, col(tsCol)).as("period"),
      col(activityCol).as("_a"))
    val perPeriod = bucketed.groupBy("period", "_a")
      .agg(count(lit(1)).as("n_pa"))
    val periodTotals = perPeriod.groupBy("period").agg(sum("n_pa").as("n_p"))
    val globalActs = perPeriod.groupBy("_a").agg(sum("n_pa").as("g_a"))
    val grandTotal = globalActs.agg(sum("g_a").as("g"))

    // Every (period, activity) pair needs a row even when n_pa = 0
    // (the activity exists globally but is absent this period) — the
    // base is the period × alphabet cross product, both tiny.
    val base = periodTotals
      .crossJoin(broadcast(globalActs))
      .crossJoin(broadcast(grandTotal))
      .join(perPeriod, Seq("period", "_a"), "left")
      .na.fill(0L, Seq("n_pa"))

    base
      .withColumn("_num", abs(col("n_pa") * col("g") - col("g_a") * col("n_p")))
      .groupBy(col("period"), col("n_p"), col("g"))
      .agg(sum("_num").as("_l1num"))
      .select(col("period"), col("n_p").as("n_events"),
        (col("_l1num").cast("double") /
          (col("n_p") * col("g")).cast("double")).as("l1_x2_vs_global"))
  }
}
