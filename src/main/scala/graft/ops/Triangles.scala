package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact triangle counting + global clustering coefficient over an
  * undirected graph — the third member of the iterative/combinatorial
  * graph family next to PageRank (`ops/PageRank.scala`) and connected
  * components (`dedup/Dedup.scala` clusters). The reference's data
  * model stops at the DFG/social-network graphs
  * (`/root/reference/src/extension/organizational.rs:82-112`); this is
  * the same graph surface taken to cohesion metrics.
  *
  * Algorithm: degree-ordered orientation ("compact-forward"). Each
  * undirected edge {u,v} is directed from the endpoint with the
  * smaller (degree, id) to the larger; every triangle then has exactly
  * one apex with two out-edges, so counting (apex → v, apex → w, v<w)
  * wedges closed by an edge {v,w} counts each triangle exactly once.
  *
  * Scale shape: orientation bounds out-degree by O(√m) on any graph,
  * so the wedge self-join — the only super-linear step — produces
  * Σ C(outdeg, 2) = O(m^1.5) rows worst case and far fewer on
  * bounded-degeneracy graphs; hub vertices are automatically demoted
  * to wedge *endpoints*, never apexes. All joins are equi-joins
  * (shuffle or broadcast as AQE sizes them); the closure check is one
  * hash join of wedges against the (a<b)-keyed edge list. Everything
  * is exact i64 — the clustering coefficient is reported in permille
  * via integer division so the gate hash is float-free.
  */
object Triangles {

  /** Distinct co-order part pairs: parts appearing in the same order
    * are linked; (a, b) with a < b, deduplicated across orders. */
  def coOrderPartPairs(spark: SparkSession, dir: String): DataFrame = {
    val op = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    op.as("x").join(op.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .distinct()
  }

  /** Bounded k-core peel: `rounds` iterations of "drop every node with
    * degree < k, restrict edges to survivors". The full k-core is this
    * run to fixpoint; a fixed round count keeps the operator a finite
    * deterministic plan (the gate's unrolled-SQL contract, same move
    * as PageRank's fixed iterations) and each round can only shrink
    * the graph, so survivors after R rounds are a superset of the
    * true k-core that converges monotonically as R grows.
    *
    * Output: one row per round (1-based): round, n_nodes (survivors),
    * n_edges (both-endpoint-surviving edges).
    *
    * Scale shape: per round ONE partial-agg degree shuffle + two
    * semi-joins of the edge list against the (node-sized, shrinking)
    * survivor set; the edge list never grows and nothing is collected.
    */
  def kCorePeel(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    import pairs.sparkSession.implicits._
    // Eager per-round evaluation: a lazily-composed union would
    // recompute the whole peel chain (pairs included) once per output
    // row — O(rounds²) passes. The result is rounds tiny rows, so
    // materializing is the honest plan (same contract as
    // PageRank.topK). ONE degree aggregation per round does triple
    // duty: round r's survivor counts (n_nodes = |deg rows|, n_edges
    // = Σdeg/2 — the doubled list stays symmetric after symmetric
    // filtering, so `div` is exact) AND round r+1's keep-filter — the
    // previous formulation paid a second countDistinct expand-agg
    // over the full edge list per round. Each round's edge list and
    // degree table are cached and the PREVIOUS round's are dropped as
    // soon as the new degree table is materialized, so peak cached
    // footprint is two generations, not rounds.
    // localCheckpoint (not cache): each round's edge list is
    // materialized AND its lineage truncated, so round r's plan is
    // always [checkpointed edges ⋉ keep ⋉ keep → agg] — constant
    // size. With cache() the logical chain deepens every round and
    // the first execution re-plans/codegens the whole unrolled
    // cascade per action (~7 s of the measured first-run cost; under
    // the driver's contended full-sequence run that planning spike is
    // exactly the 4.9 s → 13.1 s instability flagged in round 8).
    // MEMORY_AND_DISK storage, so pressure spills instead of
    // recomputing (nothing upstream to recompute after truncation).
    var e = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    def degreesOf(edges: DataFrame): DataFrame =
      edges.groupBy("src").agg(count(lit(1)).as("_deg")).cache()
    var deg = degreesOf(e)
    val rows = (1 to rounds).map { r =>
      val keep = deg.filter(col("_deg") >= k).select(col("src").as("_n"))
      val ePrev = e
      val degPrev = deg
      // ONE degree aggregation per round does double duty: round r's
      // survivor counts (n_nodes = |deg rows|, n_edges = Σdeg/2 — the
      // doubled list stays symmetric after symmetric filtering, so
      // `div` is exact) and round r+1's keep-filter (the previous
      // formulation paid a second countDistinct expand-agg per round).
      e = ePrev
        .join(keep.select(col("_n").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("_n").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      deg = degreesOf(e)
      val agg = deg.agg(
          count(lit(1)).as("n_nodes"),
          coalesce(expr("CAST(sum(_deg) div 2 AS BIGINT)"), lit(0L))
            .as("n_edges"))
        .head()
      degPrev.unpersist(blocking = false)
      // release the checkpoint blocks NOW (LocalCkpt scaladoc):
      // Dataset.unpersist does not reach them, and three stale edge
      // generations otherwise sit in the store until GC
      LocalCkpt.free(ePrev)
      (r, agg.getLong(0), agg.getLong(1))
    }
    deg.unpersist(blocking = false)
    LocalCkpt.free(e)
    rows.toDF("round", "n_nodes", "n_edges")
  }

  /** Graph cohesion summary of an undirected edge list.
    *
    * @param pairs columns (a: long, b: long), a < b, distinct.
    * @return one row: n_nodes, n_edges, n_wedges (paths of length 2,
    *         Σ C(deg,2)), n_triangles, clustering_permille
    *         (⌊3000·triangles / wedges⌋; 0 when wedge-free).
    */
  def stats(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // The summary fans the SAME frames into five branches (deg feeds
    // the orientation twice and the wedge total; pairs feeds deg, the
    // orientation and the edge count; adj probes twice). Uncached,
    // every physical reference duplicates the whole upstream subtree
    // — the r17 plan audit counted 188 Exchange nodes, dominated by
    // re-derivations of the pair self-join. Cache the shared frames,
    // evaluate the single result row EAGERLY, release the caches, and
    // rewrap (the kCorePeel/PageRank.topK convention — the output is
    // one row, so materializing is the honest plan).
    val (out, shared) = statsPlan(pairs, doCache = true)
    try {
      val rows = out.collect() // exactly one row
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally shared.foreach(_.unpersist(blocking = false))
  }

  /** The lazy plan behind [[stats]], factored out so plan-shape tests
    * can assert the wedge equi-join shape (stats itself materializes
    * to one row, so its public plan is a LocalTableScan). Returns the
    * one-row summary frame plus the fan-out frames to unpersist after
    * the action when `doCache` is set. */
  private[graft] def statsPlan(pairs: DataFrame,
                               doCache: Boolean): (DataFrame, Seq[DataFrame]) = {
    def shared(df: DataFrame) = if (doCache) df.cache() else df
    val p = shared(pairs.select(col("a"), col("b")))
    val deg = shared(p.select(col("a").as("n"))
      .union(p.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg")))
    val withDeg = p
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    // a < b by contract, so the (da == db) tie keeps id order.
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val directed = shared(withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("src"),
      when(lowFirst, col("b")).otherwise(col("a")).as("dst")))
    // Adjacency-intersection count: per directed edge (u,v),
    // |N⁺(u) ∩ N⁺(v)| — each triangle's unique 2-out-degree apex
    // contributes exactly once. Equivalent to enumerating apex wedges
    // and probing for the closing edge, but the wedge stream (≈ Σ
    // C(outdeg,2) rows — 74M at sf0.1) is never materialized through
    // a join: the intersection runs as per-row array arithmetic over
    // out-neighbor lists whose length the orientation caps at O(√m).
    val adj = shared(directed.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("_nbrs")))
    val tri = directed
      .join(adj, Seq("src"))
      .withColumnRenamed("_nbrs", "_nu")
      .join(adj.select(col("src").as("dst"), col("_nbrs").as("_nv")), Seq("dst"))
      .agg(coalesce(sum(size(array_intersect(col("_nu"), col("_nv"))).cast("long")),
        lit(0L)).as("n_triangles"))

    val totals = deg.agg(
      count(lit(1)).as("n_nodes"),
      // deg·(deg−1) is even, so `div` is exact; i64 throughout (the
      // Scala `/` on long columns would promote to double).
      sum(expr("(deg * (deg - 1)) div 2")).cast("long").as("n_wedges"))
    val edges = p.agg(count(lit(1)).as("n_edges"))

    val out = totals.crossJoin(edges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0L,
          expr("(n_triangles * 3000) div n_wedges"))
          .otherwise(lit(0L)).cast("long").as("clustering_permille"))
    (out, Seq(p, deg, directed, adj))
  }
}
