package graft.tools

import java.security.MessageDigest

/** Plan-shape pinning for the most expensive gate queries: the local
  * gate (`tools/check.py`) diffs each query's normalized physical-plan
  * digest against the reviewed pins in `tools/plan_digests.json`, so a
  * plan regression (a window sneaking a shuffle back in, a broadcast
  * degrading to sort-merge) FAILS the gate rather than just drifting
  * the bench. Complements PlanShapeSpec's property pins with
  * whole-plan coverage.
  *
  * Normalization strips run-variant noise — expression/plan ids, file
  * paths, partition counts, sizes — leaving operator structure, join
  * strategies, keys, pushed filters, and read schemas.
  */
object PlanPin {

  /** The expensive queries worth whole-plan pinning (bench top-10). */
  val Pinned: Seq[String] = Seq(
    "q_trace_clusters",
    "q_dedup_canonical",
    "q_dedup_clusters",
    "q_dedup_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_embedding",
    "q_sim_topk_ivf",
    "q_sim_topk_pq",
    "q_sim_topk_ivfpq",
    "q_sim_knn_graph",
    "q_sim_knn_graph_auto",
    "q_range_join_active",
    "q_declare_constraints")

  def normalize(plan: String): String = plan
    .replaceAll("#\\d+[A-Za-z]*", "#x")                 // expression ids
    .replaceAll("@[0-9a-f]{4,}", "@x")                  // identity hashes
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("\\[id=#x\\]", "")
    .replaceAll("(hash|range)partitioning\\(([^)]*), \\d+\\)", "$1partitioning($2, n)")
    .replaceAll("InMemoryFileIndex\\([^)]*\\)\\[[^\\]]*\\]?", "files")
    .replaceAll("file:[^,\\s\\]]+", "path")
    .replaceAll("/[-A-Za-z0-9_./]*parquet[^,\\s\\]]*", "path")
    .replaceAll("Statistics\\([^)]*\\)", "stats")
    .replaceAll("\\d+\\.\\d+ (B|KiB|MiB|GiB)", "size")
    .replaceAll("\\s+", " ")
    .trim

  def digest(plan: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(normalize(plan).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
