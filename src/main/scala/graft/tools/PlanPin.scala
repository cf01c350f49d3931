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
  * Normalization reduces the plan to its SALIENT token stream —
  * exchanges (with partitioning keys), join strategies, aggregate and
  * window nodes, scans with pushed filters and read schemas — in tree
  * order. Byte-hashing the full tree string proved too brittle: the
  * order of constraint-inferred `isnotnull` conjuncts inside Filter
  * nodes varies with session history (expression-id allocation), so
  * identical plans hashed differently depending on which queries ran
  * earlier in the same JVM. The token stream keeps exactly what the
  * gate must defend (a window sneaking a shuffle back in, a broadcast
  * degrading to sort-merge, a filter no longer pushed, a scan reading
  * extra columns) and nothing order-fragile; PushedFilters lists are
  * sorted for the same reason.
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
    "q_sim_topk_pq_auto",
    "q_range_join_active",
    "q_declare_constraints",
    "q_dedup_spans",
    "q_dedup_span_coverage",
    // round-6 additions: the bounded-window quantile selection, the
    // broadcast bloom probe, and the zero-wide-shuffle BM25 scorer
    // (q_graph_pagerank is NOT pinnable — topK rewraps the k collected
    // rows, so its returned plan is a LocalTableScan by design)
    "q_exact_quantiles",
    "q_dedup_bloom",
    "q_text_bm25",
    // round-8: the wedge self-join must stay an equi-join on the apex
    // (a cartesian here is quadratic in edges)
    "q_graph_triangles",
    // round-9: the image near-dup must stay the banded bucket-group +
    // double-explode (NO pairwise join anywhere; the only exchanges
    // are the bucket agg and the final pair distinct)
    "q_image_dedup",
    // round-9 second wave (single-plan new queries; the iterative
    // clusters_distributed returns a localCheckpoint scan by design
    // and is not pinnable): keywords must keep the vocab-sized df
    // join + ONE doc-key window; the quantile compositions must keep
    // the bucketed rank selection (no whole-group sort); entity match
    // must stay the pigeonhole equi-join (a cartesian is n² in names)
    "q_text_keywords",
    "q_dfg_performance_quantiles",
    "q_funnel_time_quantiles",
    "q_entity_match",
    // round-11: the one-pass outlier pipeline must keep lineitem to a
    // SINGLE scan branch (the old shape rescanned the table to flag
    // rows against the broadcast p99 — the digest pins the rescan out)
    "q_outlier_flags",
    // round-16: the spectrum must keep the bucketed rank selection +
    // BROADCAST threshold join-back (an NTILE/sort-merge here melts a
    // hot segment onto one partition); the deviation flag pass must
    // keep its profile join a broadcast (alphabet²-row build side)
    "q_perf_spectrum",
    "q_temporal_deviations")

  private val Salient = (
    "ReusedExchange|" +
    "Exchange (?:hash|range)partitioning\\([^)]*\\)|" +
    "Exchange SinglePartition|" +
    "Exchange RoundRobinPartitioning\\(n\\)|" +
    "BroadcastExchange|" +
    // Plans print the key lists RIGHT AFTER the node name
    // ("SortMergeJoin [k#x], [k#x], Inner"), so the token must match
    // the bracket form — a `\w+` suffix here captures nothing and
    // silently drops join strategy/keys from every digest.
    "(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[[^\\]]*\\], \\[[^\\]]*\\], \\w+|" +
    "(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)|" +
    "CartesianProduct|BroadcastNestedLoopJoin|" +
    "HashAggregate|ObjectHashAggregate|SortAggregate|" +
    "WindowGroupLimit|Window|Generate|Expand|" +
    "FileScan parquet|" +
    // driver-materialized results (e.g. the union-find small-edge path
    // of q_dedup_clusters) plan as a bare LocalTableScan — keep the
    // token so those pins assert the path taken, not the empty string
    "LocalTableScan|" +
    "PushedFilters: \\[[^\\]]*\\]|" +
    "ReadSchema: struct<[^>]*>").r

  def normalize(plan: String): String = {
    val pre = plan
      .replaceAll("#\\d+[A-Za-z]*", "#x")               // expression ids
      .replaceAll("@[0-9a-f]{4,}", "@x")                // identity hashes
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("(hash|range)partitioning\\(([^)]*), \\d+\\)", "$1partitioning($2, n)")
      .replaceAll("RoundRobinPartitioning\\(\\d+\\)", "RoundRobinPartitioning(n)")
      .replaceAll("\\s+", " ")
    Salient.findAllIn(pre).map { t =>
      if (t.startsWith("PushedFilters: [")) {
        val inner = t.stripPrefix("PushedFilters: [").stripSuffix("]")
        "PushedFilters: [" + inner.split(", ").sorted.mkString(", ") + "]"
      } else t
    }.mkString("\n")
  }

  def digest(plan: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(normalize(plan).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
