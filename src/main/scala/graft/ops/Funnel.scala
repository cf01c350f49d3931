package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel / precedence counting: for every target event, how many
  * source events by the same case preceded it within a time window —
  * the range-join face of the reference's interval predicates
  * (`/root/reference/src/extension/time.rs:20-188`) applied across
  * two event classes.
  *
  * Scale shape: a bare equi-join on the case key is quadratic per hot
  * key (a case with 10^4 targets × 10^5 sources melts one reducer).
  * Instead the join key is (case, time-bucket): each target joins only
  * the source buckets its window can reach — ceil(window/bucket)+1 of
  * them — so a reducer's work is bounded by per-bucket activity, not
  * per-case history. Bucket width = window width ⇒ each target
  * expands to exactly 2 bucket probes.
  */
object Funnel {

  /** Per (case, target-id): count of `sources` rows with
    * `s.ts < t.ts && t.ts - s.ts <= windowUs`. Targets with no
    * in-window source are kept with count 0 (left-join semantics).
    *
    * `targets` must have (caseCol, idCol, tsCol); `sources`
    * (caseCol, tsCol). Output: (caseCol, idCol, n_prior).
    */
  def priorCounts(targets: DataFrame, sources: DataFrame,
      caseCol: String, idCol: String, tsCol: String,
      windowUs: Long): DataFrame = {
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / windowUs).cast("long")
    val t = targets.select(col(caseCol), col(idCol), col(tsCol).as("_t_ts"))
      .withColumn("_b",
        explode(array(bucket(col("_t_ts")), bucket(col("_t_ts")) - 1)))
    val s = sources.select(col(caseCol), col(tsCol).as("_s_ts"))
      .withColumn("_b", bucket(col("_s_ts")))
    t.join(s, Seq(caseCol, "_b"), "left")
      .withColumn("_hit",
        when(col("_s_ts").isNotNull &&
          col("_s_ts") < col("_t_ts") &&
          unix_micros(col("_t_ts")) - unix_micros(col("_s_ts")) <= windowUs,
          lit(1L)).otherwise(lit(0L)))
      .groupBy(col(caseCol), col(idCol))
      .agg(sum("_hit").as("n_prior"))
  }

  /** Per-case time-to-convert through the FULL stage chain: for every
    * case that reaches the last stage (same strict event-order
    * semantics as [[orderedStages]]), the time from its stage-0 first
    * reach to its final-stage first reach. Feed into
    * [[Quantiles.exactByGroup]] for the conversion-latency
    * distribution (the product-analytics "how long to convert" view).
    *
    * Scale shape: the same shrinking case-keyed reach chain as
    * [[orderedStages]], but with a single consumer (the final stage),
    * so the lazy linear composition is the right plan — no caching,
    * no re-derivation. The stage-0 time rides along the chain as a
    * per-case constant (min-folded), avoiding a join back to the
    * stage-0 table. Output: (caseCol, convert_us).
    */
  def conversionTimes(events: DataFrame, caseCol: String, tsCol: String,
      stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(stages.size >= 2, "conversion needs at least two stages")
    var reached: DataFrame = null // (caseCol, _t, _t0)
    stages.zipWithIndex.foreach { case ((_, pred), i) =>
      val matching = events.filter(pred)
      reached =
        if (i == 0)
          matching.groupBy(col(caseCol)).agg(min(col(tsCol)).as("_t"))
            .withColumn("_t0", col("_t"))
        else
          matching
            .join(reached.withColumnRenamed("_t", "_t_prev"), caseCol)
            .filter(col(tsCol) > col("_t_prev"))
            .groupBy(col(caseCol))
            .agg(min(col(tsCol)).as("_t"), min(col("_t0")).as("_t0"))
    }
    reached.select(col(caseCol),
      (unix_micros(col("_t")) - unix_micros(col("_t0"))).as("convert_us"))
  }

  /** Ordered k-stage funnel: a case reaches stage i when it has an
    * event matching stage i's predicate strictly after the timestamp
    * at which it first reached stage i−1 (stage 0 = first matching
    * event). The classic "view → click → purchase" conversion count,
    * with strict event-order semantics (not mere co-occurrence).
    *
    * Scale shape: stage i is one filtered scan + a groupBy on the
    * case key joined against the stage-(i−1) reach table — which is
    * case-sized, shrinking per stage, and co-partitioned on the same
    * key, so each stage is a single shuffle of matching events and
    * the joins reuse the case-hash partitioning. Each reach table is
    * cached and its count taken eagerly (same contract as
    * `Triangles.kCorePeel`): a lazily-composed union would re-derive
    * stage i's whole chain from raw events once per later branch —
    * O(k²) logical scans hidden behind ReusedExchange. The result is
    * k tiny rows, so materializing is the honest plan; caches are
    * dropped before returning.
    *
    * @param stages (name, predicate) per stage, in funnel order.
    * @return (stage_idx, stage, n_cases) — one row per stage.
    */
  def orderedStages(events: DataFrame, caseCol: String, tsCol: String,
      stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    import events.sparkSession.implicits._
    var reached: DataFrame = null // (caseCol, _t): first time stage i reached
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    try {
      val rows = stages.zipWithIndex.map { case ((name, pred), i) =>
        val matching = events.filter(pred)
        reached =
          if (i == 0)
            matching.groupBy(col(caseCol)).agg(min(col(tsCol)).as("_t"))
          else
            matching
              .join(reached.withColumnRenamed("_t", "_t_prev"), caseCol)
              .filter(col(tsCol) > col("_t_prev"))
              .groupBy(col(caseCol)).agg(min(col(tsCol)).as("_t"))
        reached = reached.cache()
        cached += reached
        (i, name, reached.count())
      }
      rows.toDF("stage_idx", "stage", "n_cases")
    } finally cached.foreach(_.unpersist(blocking = false))
  }
}
