package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Trace clustering: group a log's variants into families of similar
  * behavior — the standard reduction step before per-cluster discovery
  * when a log is too heterogeneous for one model. Similarity is
  * character-level edit distance over the canonical variant string
  * (the classifier identity, component.rs:76-81); clusters are the
  * connected components of the ≤`maxDist` pair graph, labeled by the
  * smallest representative case id.
  *
  * Scale shape: variants (not cases!) are the clustering universe —
  * the variant inventory is orders of magnitude smaller than the log.
  * Candidate pairs come from SOUND length-band blocking: with band
  * width `maxDist + 1`, each variant lands in two buckets and every
  * pair within distance `maxDist` is guaranteed to share one (edit
  * distance ≥ length difference), so the verify step never misses a
  * true pair. The expensive `levenshtein` runs once per deduplicated
  * candidate pair, and components reuse [[Dedup.clusters]] (bounded
  * driver union-find below 2²² edges, distributed hash-to-min above).
  */
object TraceCluster {

  /** Candidate pairs within edit distance `maxDist`:
    * `(vid_a, vid_b, dist)` over a variant inventory shaped like
    * [[Sessionize.variantRepresentatives]] (`variant`, `rep_case`,
    * `n_cases`).
    */
  def editPairs(variants: DataFrame, maxDist: Int): DataFrame = {
    val w = maxDist + 1
    val v = variants.select(col("variant"),
      col("rep_case").cast("long").as("vid"),
      length(col("variant")).as("_len"))
    val banded = v.withColumn("_bucket",
      explode(array(floor(col("_len") / w), floor(col("_len") / w) + 1)))
    val a = banded.select(col("_bucket"), col("variant").as("_va"),
      col("vid").as("vid_a"), col("_len").as("_la"))
    val b = banded.select(col("_bucket"), col("variant").as("_vb"),
      col("vid").as("vid_b"), col("_len").as("_lb"))
    a.join(b, Seq("_bucket"))
      .filter(col("vid_a") < col("vid_b") &&
        abs(col("_la") - col("_lb")) <= maxDist)
      .select("vid_a", "vid_b", "_va", "_vb").distinct()
      .withColumn("dist", levenshtein(col("_va"), col("_vb")))
      .filter(col("dist") <= maxDist)
      .select("vid_a", "vid_b", "dist")
  }

  /** Full pipeline: `(variant, vid, cluster_id, n_cases)` — singleton
    * variants keep their own id as `cluster_id`.
    */
  def clusterVariants(events: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String,
      maxDist: Int): DataFrame = {
    val reps = Sessionize.variantRepresentatives(events, caseCol,
      activityCol, tsCol, tieBreak)
    val comp = Dedup.clusters(editPairs(reps, maxDist), "vid_a", "vid_b")
      .select(col("doc_id").as("_vid"), col("cluster_id"))
    reps
      .withColumn("vid", col("rep_case").cast("long"))
      .join(broadcast(comp), col("vid") === col("_vid"), "left")
      .select(col("variant"), col("vid"),
        coalesce(col("cluster_id"), col("vid")).as("cluster_id"),
        col("n_cases"))
  }
}
