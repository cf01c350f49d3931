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
}
