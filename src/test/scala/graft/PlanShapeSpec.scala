package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the optimizations the engine relies on at
  * 100 TB must be visible in the physical plan, and CI should fail if
  * a refactor silently loses them.
  */
class PlanShapeSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("concept filters push down to the parquet scan") {
    val p = plan("q_filter_concept_in")
    assert(p.contains("PushedFilters: [In(event_type"), p.take(500))
  }

  test("column pruning: q1 reads only the needed lineitem columns") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("l_returnflag"))
    assert(!p.contains("l_comment"), "unused column not pruned from scan")
  }

  test("star join broadcasts the dimension side") {
    val p = plan("q2_join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("trace cascade is a broadcast semi-join, not a shuffle join") {
    val p = plan("q_trace_filter_cascade")
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("sketch kernels stay inside WholeStageCodegen") {
    val df = Tables(spark, dir, "documents")
      .select(graft.dedup.Dedup.shingleHashes(col("text"), 3).as("s"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in plan toString
    assert(p.contains("*(1)"), p.take(500))
  }

  test("dedup pair generation contains no cartesian product") {
    Seq("q_dedup_jaccard", "q_dedup_minhash_lsh", "q_dedup_simhash",
      "q_dedup_embedding_lsh", "q_text_contamination").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("funnel joins on the time-bucketed key, never bare user_id") {
    val p = plan("q_funnel")
    // the equi-join key list must include the bucket column _b
    assert(p.contains("_b"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("triangles: wedge join is an equi-join on the apex; no cartesian") {
    // stats() materializes its one-row result eagerly (fan-out caching),
    // so the public query plan is a LocalTableScan; assert the shape on
    // the factored-out lazy plan instead.
    val pairs = graft.ops.Triangles.coOrderPartPairs(spark, dir)
    val (out, _) = graft.ops.Triangles.statsPlan(pairs, doCache = false)
    val p = out.queryExecution.executedPlan.toString
    // the 1-row result combiners (totals × edges × tri) are broadcast
    // nested-loop by design; the edge-scale joins must all be hash
    // equi-joins and nothing may be a real cartesian product
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("HashJoin"), p.take(1200))
    // and the shipped query is the materialized rewrap of that plan
    assert(plan("q_graph_triangles").contains("LocalTableScan"))
  }

  test("weighted sample is map-side + TakeOrdered — no shuffle, no global sort") {
    val p = plan("q_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"), "unexpected shuffle")
  }

  test("as-of join is one exchange on the key — no range join, no cartesian") {
    val p = plan("q_asof_last_click")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    // union-window plan: a Window over user_id, not a join at all
    assert(p.contains("Window"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "as-of must not be a join")
  }

  test("exact dedup shuffles digests once: no join-back, no second exchange") {
    val p = plan("q_dedup_exact")
    assert(!p.contains("Join"), "exact dedup must be agg+explode, not a join")
    // exactly one shuffle exchange (the groupBy on the digest)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, plan has $exchanges")
  }

  test("IVF candidate generation is an equi-join on the centroid id") {
    val p = plan("q_sim_topk_ivf")
    assert(p.contains("_cid"), p.take(1200))
    assert(!p.contains("CartesianProduct"), "corpus×query must not be cartesian")
    // the ONLY shuffle is the final per-query top-k window; assignment
    // and probe selection are map-side kernels
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange (top-k window), got $exchanges")
  }

  test("IVF assignment stage is a zero-exchange scan (no join, no window)") {
    val e = Tables(spark, dir, "embeddings")
    val (ids, cents) = graft.sim.Ann.ivfCentroids(e, "vec_id", "embedding", 50)
    val p = graft.sim.Ann.ivfAssignments(e, "vec_id", "embedding", ids, cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("Join"), "assignment must not join")
    assert(!p.contains("Window"), "assignment must not window")
  }

  test("kNN graph: bucket-grouped candidates, no cartesian, no query broadcast of the corpus") {
    val p = plan("q_sim_knn_graph")
    assert(!p.contains("CartesianProduct"), "knn graph must not be cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // candidate generation is the one-shuffle bucket grouping
    assert(p.contains("collect_list"), p.take(1200))
  }

  test("performance DFG shares the frequency DFG's one case-key window pass") {
    val p = plan("q_dfg_performance")
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("Join"), "edgePerformance must not join")
  }

  test("DFG simplification thresholds via broadcast semi-joins") {
    val p = plan("q_dfg_simplified")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "alphabet-sized kept-set must broadcast, not shuffle-join")
  }

  test("co-occurrence self-join is co-located on the case key") {
    val p = plan("q_cooccurrence")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("prefix features: pure window plan — no joins, ONE exchange") {
    // hashpartitioning(case) satisfies the (case, activity) window's
    // clustered distribution, so the finer window adds a sort but NO
    // second shuffle.
    val p = plan("q_prefix_features")
    assert(!p.contains("Join"), "prefix features must not join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("DECLARE discovery: per-case pair join is an equi-join, never cartesian") {
    val p = plan("q_declare_constraints")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("trace clustering: pigeonhole candidates are an equi-join on (len, segIdx, seg)") {
    val reps = graft.ops.Sessionize.variantRepresentatives(
      Tables(spark, dir, "events"), "user_id", "event_type", "ts", "event_id")
    val p = graft.ops.TraceCluster.editPairs(reps, 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("segIdx"), "pigeonhole key missing from the join")
    // Exactly ONE nested-loop join is legitimate: the short-string
    // bucket (strings of length <= d), whose build side is provably
    // alphabet-bounded (at most |alphabet|^d such strings exist).
    // The main candidate join must stay a hash join.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 1, s"unexpected nested-loop joins: $bnlj")
  }

  test("drift: alphabet/period rollup only — no cartesian beyond 1-row broadcasts") {
    val p = plan("q_log_drift")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("similar-task: inverted-index equi-join on the task key") {
    val p = plan("q_profile_similarity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("LM score: gram-keyed equi-joins only; chunking: zero-exchange scan") {
    val lm = plan("q_text_lm_score")
    assert(!lm.contains("CartesianProduct") &&
      !lm.contains("BroadcastNestedLoopJoin"), lm.take(1200))
    val ch = plan("q_text_chunks")
    assert(!ch.contains("Exchange"),
      "chunking must stay a zero-shuffle scan: " + ch.take(800))
  }

  test("span dedup: single-pass capped collect, no joins, two exchanges") {
    val p = plan("q_dedup_spans")
    // the hub cutoff is now INSIDE the one gram aggregation (the
    // size-capped collect, ObjectHashAggregate with map-side partial)
    // — no df pre-pass, no semi-join, no second gram scan
    assert(p.contains("graft_capped_occ_list"),
      "expected the capped occurrence-list aggregate: " + p.take(1200))
    assert(!p.contains("Join"), "span dedup must not join: " + p.take(1200))
    assert(!p.contains("CartesianProduct"))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"span dedup must scan grams once: $scans\n" + p.take(1500))
    val ex = "Exchange".r.findAllIn(p).length
    assert(ex <= 2, s"span dedup grew exchanges: $ex\n" + p.take(1500))
  }

  test("PlanPin.normalize keeps join strategy + keys in the digest") {
    import graft.tools.PlanPin
    val sample =
      """*(5) SortMergeJoin [l_orderkey#123L], [o_orderkey#456L], Inner
        |:- *(2) Sort [l_orderkey#123L ASC NULLS FIRST], false, 0
        |:  +- Exchange hashpartitioning(l_orderkey#123L, 32)
        |+- BroadcastHashJoin [n_nationkey#7], [s_nationkey#9], Inner, BuildRight, false
        |   +- ShuffledHashJoin [a#1L], [b#2L], LeftSemi, BuildRight""".stripMargin
    val n = PlanPin.normalize(sample)
    assert(n.contains("SortMergeJoin [l_orderkey#x], [o_orderkey#x], Inner"), n)
    assert(n.contains("BroadcastHashJoin [n_nationkey#x], [s_nationkey#x], Inner"), n)
    assert(n.contains("ShuffledHashJoin [a#x], [b#x], LeftSemi"), n)
    assert(n.contains("Exchange hashpartitioning(l_orderkey#x, n)"), n)
    // a strategy swap at identical exchanges must change the digest
    val swapped = sample.replace("SortMergeJoin", "ShuffledHashJoin")
    assert(PlanPin.digest(sample) != PlanPin.digest(swapped),
      "SMJ<->SHJ swap must not collide")
  }
}
