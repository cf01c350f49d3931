package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative PageRank over an edge list, in exact fixed-point integer
  * arithmetic so the result is bit-identical across engines, partition
  * counts, and arrival orders (the gate-determinism contract: floor
  * divisions on i64 and order-free integer sums only — no double mass
  * ratios).
  *
  * Semantics (documented contract, the "integer PageRank" variant):
  *   - ranks are scaled integers, `scale` = one unit of mass;
  *   - r0(v) = scale for every node that appears as an edge source or
  *     destination;
  *   - one iteration:
  *       r'(v) = floor(scale * 150 / 1000)
  *             + Σ_{(u,v,w) ∈ E} (((r(u) * 850) div 1000) * w) div outw(u)
  *     where outw(u) = Σ w over u's out-edges — i.e. damping 0.85 with
  *     per-edge floor division. Nodes with no in-edges keep only the
  *     teleport term; mass lost to flooring and to dangling nodes is
  *     NOT redistributed (the "remove dangling mass" variant) — both
  *     engines lose exactly the same integer amounts.
  *
  * Scale shape ([[topK]]): `edges` is shuffled ONCE onto its `src` key
  * and cached with the out-weight pre-joined; each of the `iters`
  * rounds is then a shuffle of the node-sized rank table onto `src`
  * (edges reuse the cached partitioning) followed by a `groupBy(dst)`
  * partial-agg shuffle. Rank state is node-sized, never edge-sized;
  * only the k result rows reach the driver.
  *
  * Overflow bound: with total mass ≤ N·scale, the per-edge product is
  * ≤ N·scale·850·max(w); callers must keep that below 2^63 (the
  * default scale 1e6 holds to ~10^9 nodes at max(w) ≤ 10^3).
  *
  * Reference anchor: centrality over the handover-of-work social
  * graph (SURVEY.md §2.6 organizational extension;
  * /root/reference/src/stream/extension/organizational.rs:82-112
  * names the resource graph; the ranking itself is the standard
  * Brin–Page iteration, public domain).
  */
object PageRank {

  /** Full rank table as a lazy plan — no caching (each iteration
    * re-derives the edge join; intended for small/spec inputs or
    * callers that cache `edges` themselves).
    *
    * @param edges columns (src: long, dst: long, w: long), w > 0.
    * @return (node: long, rank_fp: long) for every node with at least
    *         one in-edge; symmetric graphs therefore cover all nodes.
    */
  def rankFp(edges: DataFrame, iters: Int, scale: Long = 1000000L): DataFrame = {
    val outw = edges.groupBy("src").agg(sum("w").as("ow"))
    val esrc = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("ow"))
    iterate(esrc, iters, scale)
  }

  /** Iteration core over an edge table that already carries `ow`.
    * r0 ≡ scale for every node, so round 1 needs NO rank join at all —
    * its damped contribution is the constant (scale·850) div 1000 —
    * which also means the node set never has to be materialized.
    */
  private def iterate(esrc: DataFrame, iters: Int, scale: Long): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val teleport = scale * 150L / 1000L
    val damped0 = scale * 850L / 1000L
    var ranks = esrc
      .select(col("dst"), expr(s"(${damped0}L * w) div ow").as("contrib"))
      .groupBy(col("dst").as("node"))
      .agg((sum("contrib") + lit(teleport)).as("r"))
    for (_ <- 2 to iters) {
      // SHUFFLE_HASH on the node-sized rank side: the edge table is
      // already hash-partitioned on src (topK caches it that way), so
      // a sort-merge join would re-SORT the full edge list EVERY
      // iteration — measured 39× at the ×100 point vs ~linear-in-data
      // work. Hash-building the rank table per partition leaves the
      // big side streaming and unsorted; ranks are node-sized, so the
      // build always fits (the same asymmetry that makes the
      // iteration rank-state-bounded in the first place).
      ranks = esrc.join(
          ranks.withColumnRenamed("node", "src").hint("SHUFFLE_HASH"), "src")
        .select(col("dst"),
          expr("(((r * 850) div 1000) * w) div ow").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((sum("contrib") + lit(teleport)).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fp"))
  }

  /** Top-k nodes by (rank_fp desc, node asc) after `iters` rounds,
    * with the out-weighted edge table cached across the iterations and
    * released before returning. The k result rows are collected
    * (k-bounded, driver-safe) and rewrapped as a local DataFrame so
    * the returned plan no longer references the unpersisted cache.
    */
  def topK(spark: SparkSession, edges: DataFrame, iters: Int, k: Int,
           scale: Long = 1000000L,
           localMaxEdges: Long = graft.ops.Triangles.localMaxEdgesDefault)
      : DataFrame = {
    import spark.implicits._
    // ONE materialization of the edge list up front (r17, the IM-log
    // hybrid-tail pattern shared with Triangles): the count picks the
    // execution tier, and the checkpoint keeps a lazy caller plan
    // (e.g. coTransactionEdges' symmetrizing union, whose two branches
    // would otherwise each re-derive the pair aggregation) from being
    // computed once per downstream reference.
    val ck = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(true)
    val n = ck.count()
    if (n <= localMaxEdges) {
      // driver tail: identical fixed-point integer iteration over the
      // collected array (path equality pinned in PageRank spec)
      val es = ck.as[(Long, Long, Long)].collect()
      LocalCkpt.free(ck)
      return topKLocal(es, iters, k, scale).toDF("node", "rank_fp")
    }
    val outw = ck.groupBy("src").agg(sum("w").as("ow"))
    val esrc = ck.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("ow"))
      .repartition(col("src")).cache()
    try {
      val ranked = iterate(esrc, iters, scale)
        .orderBy(col("rank_fp").desc, col("node").asc)
        .limit(k)
      val rows: Array[Row] = ranked.collect() // k rows, bounded
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), ranked.schema)
    } finally {
      esrc.unpersist()
      LocalCkpt.free(ck)
    }
  }

  /** Driver tail of [[topK]]: the same per-edge floor-division
    * arithmetic and (rank desc, node asc) selection over a collected
    * (src, dst, w) array. */
  private[graft] def topKLocal(es: Array[(Long, Long, Long)], iters: Int,
      k: Int, scale: Long): Seq[(Long, Long)] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val teleport = scale * 150L / 1000L
    val damped0 = scale * 850L / 1000L
    val ow = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (s, _, w) => ow.update(s, ow.getOrElse(s, 0L) + w) }
    // round 1: r0 ≡ scale, damped contribution is a constant
    var ranks = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (s, d, w) =>
      ranks.update(d, ranks.getOrElse(d, 0L) + damped0 * w / ow(s))
    }
    ranks.transformValues(_ + teleport)
    for (_ <- 2 to iters) {
      val next = scala.collection.mutable.LongMap.empty[Long]
      es.foreach { case (s, d, w) =>
        // the distributed tier joins edges to ranks on src: edges
        // whose src holds no rank contribute nothing
        ranks.get(s).foreach { r =>
          next.update(d, next.getOrElse(d, 0L) + (r * 850L / 1000L) * w / ow(s))
        }
      }
      next.transformValues(_ + teleport)
      ranks = next
    }
    ranks.toSeq.map { case (node, r) => (node, r) }
      .sortBy { case (node, r) => (-r, node) }.take(k)
  }

  /** The co-transaction graph used by the gated query: supplier and
    * customer of the same order are linked, symmetrized, weighted by
    * lineitem count. Node ids: 2·suppkey for suppliers, 2·custkey+1
    * for customers (disjoint key spaces).
    */
  def coTransactionEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), (col("l_suppkey").cast("long") * 2L).as("s"))
    val ord = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), (col("o_custkey").cast("long") * 2L + 1L).as("c"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("s", "c").agg(count(lit(1)).as("w"))
    pairs.select(col("s").as("src"), col("c").as("dst"), col("w"))
      .union(pairs.select(col("c").as("src"), col("s").as("dst"), col("w")))
  }
}
