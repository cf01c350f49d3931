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

  /** Edge-count cutoff under which the peel/summary folds on the
    * driver (r17, the IM-log hybrid-tail pattern): BOTH graph queries
    * spend 3-5 s of pure stage/shuffle latency on a ~1M-edge graph at
    * sf0.1, while the identical arithmetic over a collected edge array
    * runs in milliseconds. 2^22 pairs (64 MB of boxed longs, the same
    * bound Dedup.clusters documents for its driver union-find) keeps
    * the driver safe; a 100 TB co-occurrence graph exceeds it and
    * takes the distributed path below, which is also what the
    * env-override forces for the path-equality specs. r18 (advisor):
    * parsed ONCE into a validated val — a malformed value now fails
    * loudly at first use instead of throwing NumberFormatException
    * deep inside query construction on every call; and note the 2^22
    * bound is ~64 MB of PAYLOAD but 200-270 MB on-heap once boxed as
    * (Long, Long) tuples (more for PageRank's 3-tuples) — a real
    * driver-heap consideration near the cutoff, covered by the 48 GB
    * driver in this deployment and tunable via the env var. */
  private[graft] lazy val localMaxEdgesDefault: Long = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_GRAPH_LOCAL_EDGES",
      (1L << 22).toString)
    try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"SPARK_GRAFT_GRAPH_LOCAL_EDGES must be a long, got '$raw'")
    }
  }

  /** Distinct co-order part pairs: parts appearing in the same order
    * are linked; (a, b) with a < b, deduplicated across orders.
    *
    * Shape (r17): ONE partial-agg shuffle builds each order's sorted
    * distinct part set (collect_set merges map-side), the per-order
    * C(n,2) pairs explode from the array with no join, and the final
    * distinct is the second and last shuffle. The previous self-join
    * form paid three (distinct(o,p), the o-join, distinct(a,b)) and
    * re-derived its input once per side. Per-order blowup is identical
    * to the join form (C(n,2) rows either way); the sorted array makes
    * a < b structural. */
  def coOrderPartPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x, y))))"))
        .as("pr"))
      .select(col("pr.x").as("a"), col("pr.y").as("b"))
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
  def kCorePeel(pairs: DataFrame, k: Int, rounds: Int,
                localMaxEdges: Long = localMaxEdgesDefault): DataFrame = {
    import pairs.sparkSession.implicits._
    // ONE materialization of the pair list up front: the doubled edge
    // union below otherwise computes the whole pairs pipeline twice
    // (its two branches share no exchange — per-branch pruning
    // specializes the scans), and the edge count it yields for free
    // picks the execution tier (r17).
    val ckpt = pairs.select(col("a"), col("b")).localCheckpoint(true)
    val nPairs = ckpt.count()
    if (nPairs <= localMaxEdges) {
      // driver tail: identical peel arithmetic over the collected
      // array (path equality pinned in TrianglesSpec); at sf0.1 this
      // replaces ~8 distributed jobs on a 1.2M-edge graph
      val es = ckpt.as[(Long, Long)].collect()
      LocalCkpt.free(ckpt)
      return kCorePeelLocal(es, k, rounds).toDF("round", "n_nodes", "n_edges")
    }
    val pairsCk = ckpt
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
    var e = pairsCk.select(col("a").as("src"), col("b").as("dst"))
      .union(pairsCk.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    LocalCkpt.free(pairsCk) // doubled list materialized; pairs blocks done
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
  def stats(pairs: DataFrame,
            localMaxEdges: Long = localMaxEdgesDefault): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // ONE materialization of the pair list up front (same move as
    // kCorePeel): the summary fans the SAME frame into five branches
    // (deg feeds the orientation twice and the wedge total; pairs
    // feeds deg, the orientation and the edge count; adj probes
    // twice) — uncached, every physical reference re-derived the pair
    // self-join (188 Exchange nodes in the r17 plan audit). The count
    // picks the execution tier.
    val ckpt = pairs.select(col("a"), col("b")).localCheckpoint(true)
    val nPairs = ckpt.count()
    if (nPairs <= localMaxEdges) {
      // driver tail: identical orientation/intersection arithmetic
      // over the collected array (path equality pinned in
      // TrianglesSpec)
      val es = ckpt.as[(Long, Long)].collect()
      LocalCkpt.free(ckpt)
      val (nn, ne, nw, nt, cp) = statsLocal(es)
      return Seq((nn, ne, nw, nt, cp)).toDF(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        "clustering_permille")
    }
    // distributed tier: cache the fan-out frames, evaluate the single
    // result row EAGERLY, release the caches, and rewrap (the
    // kCorePeel/PageRank.topK convention — the output is one row, so
    // materializing is the honest plan)
    val (out, shared) = statsPlan(ckpt, doCache = true)
    try {
      val rows = out.collect() // exactly one row
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      shared.foreach(_.unpersist(blocking = false))
      LocalCkpt.free(ckpt)
    }
  }

  /** Driver tail of [[kCorePeel]]: the same per-round arithmetic
    * (filter by previous round's degrees, recount, emit survivors)
    * over a collected edge array. */
  private[graft] def kCorePeelLocal(pairsArr: Array[(Long, Long)],
      k: Int, rounds: Int): Seq[(Int, Long, Long)] = {
    def degreesOf(es: Array[(Long, Long)]): scala.collection.mutable.LongMap[Long] = {
      val m = scala.collection.mutable.LongMap.empty[Long]
      var i = 0
      while (i < es.length) {
        val (a, b) = es(i)
        m.update(a, m.getOrElse(a, 0L) + 1L)
        m.update(b, m.getOrElse(b, 0L) + 1L)
        i += 1
      }
      m
    }
    var es = pairsArr
    var deg = degreesOf(es)
    (1 to rounds).map { r =>
      val dPrev = deg
      es = es.filter { case (a, b) =>
        dPrev.getOrElse(a, 0L) >= k && dPrev.getOrElse(b, 0L) >= k
      }
      deg = degreesOf(es)
      // n_nodes counts nodes with ≥1 surviving edge (the distributed
      // tier's degree table only holds rows for endpoints present in
      // the doubled list); n_edges is the undirected edge count
      (r, deg.size.toLong, es.length.toLong)
    }
  }

  /** Driver tail of [[stats]]: same degree-(then-id) orientation and
    * out-neighbor intersection as the distributed tier, over sorted
    * adjacency slices. */
  private[graft] def statsLocal(
      es: Array[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val deg = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (a, b) =>
      deg.update(a, deg.getOrElse(a, 0L) + 1L)
      deg.update(b, deg.getOrElse(b, 0L) + 1L)
    }
    val nNodes = deg.size.toLong
    val nEdges = es.length.toLong
    var nWedges = 0L
    deg.foreach { case (_, d) => nWedges += d * (d - 1) / 2 }
    // Remap node ids to dense ints so each oriented edge packs into
    // ONE long ((src << 32) | dst) — the intersection loop below then
    // runs over primitive arrays (the boxed-tuple form measured 2×
    // slower than the distributed tier it replaces; this form is ~10×
    // faster than that). The orientation itself compares ORIGINAL ids
    // (a < b by contract breaks degree ties), identical to statsPlan.
    val idOf = scala.collection.mutable.LongMap.empty[Int]
    def dense(x: Long): Long = idOf.getOrElseUpdate(x, idOf.size).toLong
    val packed = new Array[Long](es.length)
    var i = 0
    while (i < es.length) {
      val (a, b) = es(i)
      val da = deg(a); val db = deg(b)
      packed(i) =
        if (da < db || (da == db && a < b)) (dense(a) << 32) | dense(b)
        else (dense(b) << 32) | dense(a)
      i += 1
    }
    java.util.Arrays.sort(packed) // (src, dst) lexicographic
    // out-neighbor slice offsets per dense src id
    val off = new Array[Int](idOf.size + 1)
    i = 0
    while (i < packed.length) { off((packed(i) >>> 32).toInt + 1) += 1; i += 1 }
    i = 0
    while (i < idOf.size) { off(i + 1) += off(i); i += 1 }
    var nTri = 0L
    i = 0
    while (i < packed.length) {
      val u = (packed(i) >>> 32).toInt
      val v = (packed(i) & 0xffffffffL).toInt
      var x = off(u); val xh = off(u + 1)
      var y = off(v); val yh = off(v + 1)
      while (x < xh && y < yh) {
        val dx = packed(x) & 0xffffffffL; val dy = packed(y) & 0xffffffffL
        if (dx == dy) { nTri += 1; x += 1; y += 1 }
        else if (dx < dy) x += 1
        else y += 1
      }
      i += 1
    }
    val permille = if (nWedges > 0) nTri * 3000 / nWedges else 0L
    (nNodes, nEdges, nWedges, nTri, permille)
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
