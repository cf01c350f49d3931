package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal-profile conformance + performance spectrum — the
  * time-dimension analyses beside [[Dfg.edgePerformance]]'s sum/min/max
  * (reference stats surface: /root/reference/src/stream/stats.rs:63-141
  * stops at counts; the profile/spectrum semantics follow the standard
  * process-mining formulations — temporal profiles per van der Aalst's
  * conformance literature, the performance spectrum per Denisov et al.).
  *
  * All three operators ride [[Dfg.transitionDelays]]' single case-key
  * window shuffle; everything after it is alphabet²-bounded
  * (per-segment aggregates / broadcast join-backs), so the plans carry
  * to 100 TB unchanged.
  *
  * Gate-exactness conventions (the repo standard):
  *  - waits are folded at SECOND granularity (`wait_us div 1000000`,
  *    non-negative because the window orders by ts) so the second
  *    moment of a 100 TB segment stays inside DECIMAL(38,0):
  *    |wait_s| ≤ 2³¹ (68 years) ⇒ Σ w² ≤ 2⁶²·10¹² < 10³¹.
  *  - exact integer/decimal sums are cast to double ONCE at the end
  *    (correctly rounded in both engines), and every derived float is
  *    a fixed IEEE-754 expression tree on those doubles — DuckDB
  *    running the same tree yields identical bits (the
  *    [[Quantiles.winsorizedStats]] convention).
  */
object Temporal {

  /** Per-segment temporal profile: for each directly-follows pair,
    * `(act_from, act_to, n, sum_wait_s, sumsq_wait_s)` — the sufficient
    * statistics (count, first and second moment at second granularity)
    * from which mean/std derive. Sums are exact DECIMAL(38,0) folded
    * distributively, surfaced as one correctly-rounded double each.
    */
  def profile(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String): DataFrame =
    profileOf(pairsWithSeconds(events, caseCol, activityCol, tsCol, tieBreak))

  /** [[profile]] over an existing `(act_from, act_to, wait_s)` pair
    * table — shared with the streaming twin's parity gate, which feeds
    * the identical aggregation from the streamed pair rows. */
  def profileOf(pairs: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    pairs
      .groupBy(col("act_from"), col("act_to"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("wait_s"))).cast("decimal(38,0)").cast("double")
          .as("sum_wait_s"),
        sum(dec(col("wait_s")) * col("wait_s")).cast("decimal(38,0)")
          .cast("double").as("sumsq_wait_s"))
  }

  /** Temporal-conformance deviations: per segment, how many
    * directly-follows occurrences sit more than `zeta` population
    * standard deviations from the segment's own mean wait —
    * `(act_from, act_to, n, n_dev)`.
    *
    * The z-test is evaluated WITHOUT dividing: |e − μ| > ζσ with
    * μ = s1/n, σ² = (n·s2 − s1²)/n² is equivalent to
    * `(n·e − s1)² > ζ²·(n·s2 − s1²)`, a fixed IEEE tree over the exact
    * profile doubles and the occurrence's wait — no square roots, no
    * quotients, deterministic bit-for-bit across engines. Segments
    * with n < 2 have no spread to deviate from and report n_dev = 0.
    *
    * Two passes over the events (profile, then flag against the
    * broadcast alphabet²-row profile) — re-computing the narrow pair
    * window beats caching a 100 TB intermediate.
    */
  def deviations(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, zeta: Double): DataFrame = {
    val pairs = pairsWithSeconds(events, caseCol, activityCol, tsCol, tieBreak)
    deviationsOf(pairs, profileOf(pairs), zeta)
  }

  /** The flagging pass of [[deviations]] over explicit pair and
    * profile tables — the streaming twin applies the same filter
    * in-stream against the broadcast profile. Returns per-occurrence
    * rows with `is_dev`; aggregate downstream. */
  def deviationFlags(pairs: DataFrame, profile: DataFrame,
      zeta: Double): DataFrame = {
    val nD = col("n").cast("double")
    val eD = col("wait_s").cast("double")
    val lhs = nD * eD - col("sum_wait_s")
    pairs.join(broadcast(profile), Seq("act_from", "act_to"))
      .withColumn("is_dev",
        col("n") >= 2L &&
          lhs * lhs > lit(zeta * zeta) *
            (nD * col("sumsq_wait_s") - col("sum_wait_s") * col("sum_wait_s")))
  }

  private def deviationsOf(pairs: DataFrame, profile: DataFrame,
      zeta: Double): DataFrame =
    deviationFlags(pairs, profile, zeta)
      .groupBy(col("act_from"), col("act_to"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_dev"), 1L).otherwise(0L)).as("n_dev"))

  /** Performance spectrum: every directly-follows occurrence classified
    * into its segment's quartile band by VALUE —
    * `band = 1 + [w > Q1] + [w > Q2] + [w > Q3]` against the segment's
    * exact 250/500/750-permille waits (rank = ceil(p·n/1000), the
    * [[Quantiles.exactByGroup]] contract) — then rolled up to
    * `(act_from, act_to, band, n, min_wait_us, max_wait_us)`.
    *
    * Value-banding (ties share a band) rather than NTILE keeps the
    * assignment a pure broadcast-joined comparison: the only
    * row-proportional work is the pair window and the quantile
    * kernel's bucketed cum table — never a full per-segment sort on
    * one partition, which is what an NTILE over a hot segment becomes.
    */
  def spectrum(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String): DataFrame = {
    val pairs = Dfg.transitionDelays(events, caseCol, activityCol, tsCol,
      tieBreak)
    val th = Quantiles
      .exactByGroup(pairs, Seq("act_from", "act_to"), col("wait_us"),
        Seq(250, 500, 750))
      .groupBy(col("act_from"), col("act_to"))
      .agg(
        max(when(col("p_permille") === 250, col("value"))).as("_q1"),
        max(when(col("p_permille") === 500, col("value"))).as("_q2"),
        max(when(col("p_permille") === 750, col("value"))).as("_q3"))
    pairs.join(broadcast(th), Seq("act_from", "act_to"))
      .withColumn("band",
        lit(1) + (col("wait_us") > col("_q1")).cast("int")
          + (col("wait_us") > col("_q2")).cast("int")
          + (col("wait_us") > col("_q3")).cast("int"))
      .groupBy(col("act_from"), col("act_to"), col("band"))
      .agg(count(lit(1)).as("n"),
        min(col("wait_us")).as("min_wait_us"),
        max(col("wait_us")).as("max_wait_us"))
  }

  /** [[Dfg.transitionDelays]] + the second-granularity wait column the
    * profile folds (floor division; waits are non-negative by the
    * window order). */
  def pairsWithSeconds(events: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String): DataFrame =
    Dfg.transitionDelays(events, caseCol, activityCol, tsCol, tieBreak)
      .withColumn("wait_s", expr("wait_us div 1000000"))
}
