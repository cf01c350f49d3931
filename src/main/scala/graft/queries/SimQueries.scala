package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable.{Knuth, P}
import graft.sim.{Ann, Diversity, Quantize}

/** Similarity-search surface over `embeddings`: exact brute-force
  * top-k and multi-table hyperplane-LSH approximate top-k. Query set =
  * vec_id < 10 (a broadcastable probe set).
  */
object SimQueries {

  private val K = 5
  private val KGraph = 3
  private val NQueries = 10
  private val TablesL = 4
  private val Planes = 8
  private val Seed = 42L
  private val Dims = 64
  private val Stride = 50
  private val NProbe = 3
  private val PqM = 8 // PQ subspaces over Dims=64 → 8 dims each
  private val TargetLoad = 16
  // The auto-parameter oracles derive planes/stride from the corpus
  // count IN SQL with the engine's integer-exact arithmetic, so they
  // are correct at any sf (KnnGraphSpec/PqSpec additionally pin the
  // sf0.01 resolutions: autoPlanes(500,16)=5, autoStride(500)=2).

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hybrid retrieval: BM25 top-50 (sparse leg) ⊕ brute-cosine top-50
    // from probe vector 0 (dense leg), fused by integer reciprocal-
    // rank fusion 1e6 div (60 + rank) — the modern search stack in ONE
    // plan, all-i64 fusion so ranking is bit-equal across engines.
    // Both legs are k-bounded, so the rank windows and the outer join
    // run on ≤ 50 rows each.
    "q_hybrid_rrf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val sparse = graft.text.Bm25
        .topK(Tables(s, dir, "documents"), "text", TextQueries.Bm25Terms, 50)
        .withColumn("rs", row_number().over( // 50-row set: bounded window
          Window.orderBy(col("score_fp").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rs"))
      val e = Tables(s, dir, "embeddings")
      val dense = Ann.bruteForceTopK(e, e.filter(col("vec_id") === 0L),
          "vec_id", "embedding", 50)
        .select(col("id_n").as("doc_id"), col("rnk").as("rd"))
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .withColumn("rrf_fp",
          coalesce(expr("CAST(1000000 div (60 + rs) AS BIGINT)"), lit(0L)) +
          coalesce(expr("CAST(1000000 div (60 + rd) AS BIGINT)"), lit(0L)))
        .orderBy(col("rrf_fp").desc, col("doc_id").asc)
        .limit(20)
        .select(col("doc_id"), col("rrf_fp"))
    },
    "q_sim_topk_brute" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K)
    },
    // FILTERED vector search (the vector-DB "metadata filter" class):
    // the corpus is restricted to documents passing the quality gate
    // (embeddings join documents on the shared id) BEFORE the search,
    // so dropped docs can never occupy a top-k slot. Probe set is
    // unfiltered. Exact brute scorer over the filtered corpus — the
    // filter composes identically with the LSH/IVF scale paths.
    "q_sim_filtered_search" -> { (s, dir) =>
      import graft.text.TextOps
      val keep = Tables(s, dir, "documents")
        .filter(TextOps.qualityKeep(col("text")))
        .select(col("doc_id").as("vec_id"))
      val e = Tables(s, dir, "embeddings")
      Ann.bruteForceTopK(e.join(keep, Seq("vec_id")),
        e.filter(col("vec_id") < NQueries), "vec_id", "embedding", K)
    },
    "q_sim_topk_lsh" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.lshTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, TablesL, Planes, Seed, Dims)
    },
    "q_sim_topk_ivf" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.ivfTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, centroidStride = Stride, nProbe = NProbe)
    },
    // Product-quantization top-k: corpus compressed map-side to M-byte
    // codes (codebooks = the same deterministic stride sample as IVF),
    // scored by ADC table lookups. The 100 TB scan reads codes, not
    // raw vectors.
    "q_sim_topk_pq" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.pqTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, stride = Stride, m = PqM)
    },
    // PQ with the stride auto-sized from the corpus count: the
    // codebook is capped at 256 codewords however large the corpus —
    // fixed stride above is the oracle anchor, this is the 100 TB
    // parameter scaling (same rule as q_sim_knn_graph_auto's planes).
    "q_sim_topk_pq_auto" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.pqTopKAuto(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, m = PqM)
    },
    // IVF+PQ: cell-probe candidate pruning + compressed-code ADC
    // scoring — after the one build scan no raw corpus vector is read
    // or shipped again.
    "q_sim_topk_ivfpq" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.ivfpqTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, stride = Stride, m = PqM, nProbe = NProbe)
    },
    // Full-corpus k-NN graph (every vector is a query) — the batch
    // graph build behind dedup clustering and diversity sampling.
    // Same multi-table LSH equi-join; candidate volume is linear in
    // bucket collisions, never |corpus|². ANCHOR: the plane count is
    // FIXED, so per-bucket load — and the ×N ratio — grows with the
    // corpus BY CONSTRUCTION; kept as the labeled fixed-parameter
    // baseline (ScaleBench.Anchors marks its artifact row) that the
    // auto twin below exists to beat. Scale path: q_sim_knn_graph_auto.
    "q_sim_knn_graph" -> { (s, dir) =>
      Ann.knnGraph(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        KGraph, TablesL, Planes, Seed, Dims)
    },
    // k-NN graph with planes auto-sized from the corpus count — the
    // parameter scaling that keeps bucket load (and so candidate
    // volume per bucket) constant as the corpus grows. The fixed-plane
    // variant above is the fixed-parameter correctness anchor; this is
    // the 100 TB shape.
    "q_sim_knn_graph_auto" -> { (s, dir) =>
      Ann.knnGraphAuto(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        KGraph, TablesL, Seed, Dims, targetLoad = TargetLoad)
    },
    // Greedy k-center diversity sampling (farthest-point coreset):
    // k map-side scans, selected vectors as literal arrays, argmax =
    // TakeOrdered(1) — nothing corpus-sized collected.
    "q_sim_kcenter" -> { (s, dir) =>
      Diversity.kCenter(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", k = KCenter)
    },
    // The vector-curation pipeline as ONE composed plan: int8
    // quantization (search runs on the CODES — cosine is
    // scale-invariant) → SemDeDup on the coded vectors → k-center
    // diversity seeds from the survivors. Each stage is gated on its
    // own elsewhere; this query pins their composition, the vector
    // counterpart of q_pipeline_corpus.
    "q_pipeline_vectors" -> { (s, dir) =>
      // `coded` fans into the centroid pass, BOTH sides of the
      // semantic in-cell self-join, the survivor semi-join and the
      // k-center base — uncached, each physical reference re-derives
      // the quantization scan (r17 plan audit). The result is
      // k-bounded driver rows (kCenter rewraps), so the cache is
      // released before returning.
      val coded = Quantize.int8(Tables(s, dir, "embeddings"),
          "vec_id", "embedding")
        .select(col("vec_id"), col("q").cast("array<float>").as("embedding"))
        .cache()
      try {
        val (cids, cvecs) = Ann.ivfCentroids(coded, "vec_id", "embedding", Stride)
        val keep = graft.dedup.Dedup.semantic(coded, "vec_id", "embedding",
            cids, cvecs, tau = 0.4)
          .filter(col("keep")).select("vec_id")
        val survivors = coded.join(keep, Seq("vec_id"), "left_semi")
        Diversity.kCenter(survivors, "vec_id", "embedding", k = 5)
      } finally coded.unpersist(blocking = false)
    },
    // Random-projection features (JL): 64 -> 8 dims against the
    // deterministic mixed-LCG planes; zero-shuffle scan, one scalar
    // column per projected dim (the comparator can't hash array
    // cells). Oracle folds are op-for-op identical -> bit-equal.
    "q_sim_project" -> { (s, dir) =>
      import graft.functions.NativeExpressions
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          NativeExpressions.rpProject(col("embedding"), 8, 42L, 64).as("_rp"))
        .select(col("vec_id") +:
          (1 to 8).map(i => element_at(col("_rp"), i).as(s"rp$i")): _*)
    },

    // int8 symmetric quantization (4x embedding storage/bandwidth):
    // zero-shuffle scan; codes digested to a scalar (the comparator
    // can't hash array cells) + reconstruction cosine per vector.
    "q_sim_int8" -> { (s, dir) =>
      import graft.functions.NativeExpressions
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("_v"))
        .withColumn("scale", Quantize.int8Scale(col("_v")))
        .withColumn("_q", Quantize.int8Codes(col("_v"), col("scale")))
        .select(col("vec_id"), col("scale"),
          NativeExpressions.foldHash(
            transform(col("_q"), x => x.cast("long")), 7L).as("q_digest"),
          Quantize.reconCos(col("_v"), col("_q")).as("recon_cos"))
    }
  )

  private val KCenter = 8

  private def dot(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) " +
      s"for i in generate_series(1, len($a))]), (s, v) -> s + v)"

  private def cosSql(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Projection of v on global plane (l*planes+p), dims 1-based i. */
  private def planeDotSqlFor(planes: Int) = {
    val w = Ann.weightSql(s"(tbl*$planes + p)", "i", Seed, Dims)
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST(v[i] AS DOUBLE) * $w for i in generate_series(1, $Dims)]), " +
      s"(s, x) -> s + x)"
  }
  private val planeDotSql = planeDotSqlFor(Planes)

  /** Per-subspace fold over subspace `mExpr` (0-based): dims are the
    * 1-based parquet-list positions mExpr*Sub+i, i in 1..Sub — the
    * exact dim-order double fold of [[graft.functions.Native.pqEncode]]
    * / `pqAdc`'s table construction. */
  private def pqDotSql(a: String, b: String, mExpr: String) = {
    val sub = Dims / PqM
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST($a[$mExpr*$sub+i] AS DOUBLE)*CAST($b[$mExpr*$sub+i] AS DOUBLE) " +
      s"for i in generate_series(1, $sub)]), (s, x) -> s + x)"
  }

  private def pqL2Sql(a: String, b: String, mExpr: String) = {
    val sub = Dims / PqM
    val diff = s"(CAST($a[$mExpr*$sub+i] AS DOUBLE) - CAST($b[$mExpr*$sub+i] AS DOUBLE))"
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[$diff * $diff for i in generate_series(1, $sub)]), (s, x) -> s + x)"
  }

  // PQ: codebook = stride sample (kidx = ascending-id rank), encode =
  // per-(vector, subspace) L2² argmin (ties to smaller kidx), score =
  // ADC cosine with per-subspace folds summed in m order (ordered
  // list fold — GROUP-BY SUM order would not be deterministic).
  // Parameterized by the stride so the fixed (oracle-anchor) and
  // count-derived (auto) variants share one construction.
  private def pqOracleFor(stride: String) =
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS kidx, v AS cv
       |  FROM e WHERE vec_id % $stride = 0),
         |enc AS (SELECT vec_id, m, kidx FROM (
         |  SELECT n.vec_id, gm.m, cb.kidx,
         |    row_number() OVER (PARTITION BY n.vec_id, gm.m
         |      ORDER BY ${pqL2Sql("n.v", "cb.cv", "gm.m")}, cb.kidx) AS rn
         |  FROM e n CROSS JOIN generate_series(0, ${PqM - 1}) gm(m) CROSS JOIN cb)
         |  WHERE rn = 1),
         |pair AS (SELECT q.vec_id AS id_q, enc.vec_id AS id_n, enc.m,
         |    ${pqDotSql("q.v", "cb.cv", "enc.m")} AS dm,
         |    ${pqDotSql("cb.cv", "cb.cv", "enc.m")} AS cn2,
         |    ${pqDotSql("q.v", "q.v", "enc.m")} AS qn2
         |  FROM (SELECT * FROM e WHERE vec_id < $NQueries) q
         |  JOIN enc ON enc.vec_id <> q.vec_id
         |  JOIN cb ON cb.kidx = enc.kidx),
         |agg AS (SELECT id_q, id_n,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dm ORDER BY m)), (s, x) -> s + x) AS dots,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(cn2 ORDER BY m)), (s, x) -> s + x) AS cn2s,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(qn2 ORDER BY m)), (s, x) -> s + x) AS qn2s
         |  FROM pair GROUP BY id_q, id_n),
       |scored AS (SELECT id_q, id_n, CASE WHEN qn2s = 0 OR cn2s = 0 THEN CAST(-2.0 AS DOUBLE) ELSE dots / (sqrt(qn2s) * sqrt(cn2s)) END AS cos FROM agg)
       |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
       |  FROM scored)
       |WHERE rnk <= $K""".stripMargin

  def oracle: Map[String, String] = Map(
    // sparse leg = the q_text_bm25 oracle at k=50 (nested WITH), dense
    // leg = brute cosine from vec 0; the RRF fusion is pure i64
    "q_hybrid_rrf" ->
      s"""WITH sp AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS INT) AS rs
         |  FROM (${graft.text.Bm25.oracleSql(TextQueries.Bm25Terms, 50)}) bm),
         |n AS (SELECT vec_id, embedding AS v FROM embeddings),
         |qv AS (SELECT v FROM n WHERE vec_id = 0),
         |de AS (
         |  SELECT id_n AS doc_id, CAST(rnk AS INT) AS rd FROM (
         |    SELECT c.vec_id AS id_n,
         |      row_number() OVER (ORDER BY ${cosSql("qv.v", "c.v")} DESC, c.vec_id) AS rnk
         |    FROM n c, qv WHERE c.vec_id <> 0) x
         |  WHERE rnk <= 50)
         |SELECT COALESCE(sp.doc_id, de.doc_id) AS doc_id,
         |  CAST(COALESCE(1000000 // (60 + rs), 0)
         |     + COALESCE(1000000 // (60 + rd), 0) AS BIGINT) AS rrf_fp
         |FROM sp FULL OUTER JOIN de ON sp.doc_id = de.doc_id
         |ORDER BY rrf_fp DESC, doc_id ASC
         |LIMIT 20""".stripMargin,
    // greedy selection replayed as a single-row recursive CTE carrying
    // the selected-id list; distances replicate the engine's fold
    // exactly (fl(1-c) is monotone in c, so 1 - max(cos) IS min dist)
    "q_sim_kcenter" ->
      s"""WITH RECURSIVE emb AS (SELECT vec_id, embedding AS ev FROM embeddings),
         |sel(r, id, min_dist, ids) AS (
         |  SELECT 1 AS r, vec_id AS id, CAST(NULL AS DOUBLE) AS min_dist,
         |    [vec_id] AS ids
         |  FROM emb WHERE vec_id = (SELECT min(vec_id) FROM emb)
         |  UNION ALL
         |  SELECT sel.r + 1, nxt.id, nxt.d, list_append(sel.ids, nxt.id)
         |  FROM sel, LATERAL (
         |    SELECT cand.vec_id AS id,
         |      1 - (SELECT max(${cosSql("cand.ev", "selv.ev")}) FROM emb selv
         |           WHERE list_contains(sel.ids, selv.vec_id)) AS d
         |    FROM emb cand
         |    WHERE NOT list_contains(sel.ids, cand.vec_id)
         |    ORDER BY d DESC, cand.vec_id ASC
         |    LIMIT 1) nxt
         |  WHERE sel.r < $KCenter)
         |SELECT CAST(r AS INT) AS "rank", id AS vec_id, min_dist FROM sel""".stripMargin,

    // composed replica: int8 codes (q_sim_int8 CTEs) -> SemDeDup CTEs
    // (q_dedup_semantic) on the codes -> k-center recursion
    // (q_sim_kcenter) over the survivors, k = 5
    "q_pipeline_vectors" -> {
      def dotQ(a: String, b: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"[CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) " +
          s"for i in generate_series(1, len($a))]), (acc, x) -> acc + x)"
      def cosQ(a: String, b: String) =
        s"${dotQ(a, b)} / (sqrt(${dotQ(a, a)}) * sqrt(${dotQ(b, b)}))"
      s"""WITH RECURSIVE eraw AS (SELECT vec_id, embedding AS ev FROM embeddings),
         |m AS (SELECT vec_id, ev,
         |    list_max([abs(CAST(x AS DOUBLE)) for x in ev]) / 127.0 AS scale
         |  FROM eraw),
         |qv AS (SELECT vec_id,
         |    CASE WHEN scale = 0 THEN [CAST(0 AS BIGINT) for x in ev]
         |         ELSE [CAST(TRUNC(CAST(x AS DOUBLE) / scale) AS BIGINT)
         |               for x in ev] END AS cv
         |  FROM m),
         |c AS (SELECT vec_id AS cid, cv AS ccv FROM qv WHERE vec_id % $Stride = 0),
         |ascore AS (SELECT qv.vec_id, qv.cv, c.cid, ${cosQ("qv.cv", "c.ccv")} AS ccos
         |  FROM qv CROSS JOIN c),
         |cells AS (SELECT vec_id, cv, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |  FROM ascore) WHERE rn = 1),
         |nn AS (SELECT vec_id, cv, cid, sqrt(${dotQ("cv", "cv")}) AS nrm FROM cells),
         |drp AS (SELECT DISTINCT a.vec_id FROM nn a JOIN nn b
         |  ON a.cid = b.cid AND b.vec_id < a.vec_id
         |  WHERE ${dotQ("a.cv", "b.cv")} / (a.nrm * b.nrm) >= 0.4),
         |srv AS (SELECT vec_id, cv FROM nn
         |  WHERE vec_id NOT IN (SELECT vec_id FROM drp)),
         |sel(r, id, min_dist, ids) AS (
         |  SELECT 1 AS r, vec_id AS id, CAST(NULL AS DOUBLE) AS min_dist,
         |    [vec_id] AS ids
         |  FROM srv WHERE vec_id = (SELECT min(vec_id) FROM srv)
         |  UNION ALL
         |  SELECT sel.r + 1, nxt.id, nxt.d, list_append(sel.ids, nxt.id)
         |  FROM sel, LATERAL (
         |    SELECT cand.vec_id AS id,
         |      1 - (SELECT max(${cosQ("cand.cv", "selv.cv")}) FROM srv selv
         |           WHERE list_contains(sel.ids, selv.vec_id)) AS d
         |    FROM srv cand
         |    WHERE NOT list_contains(sel.ids, cand.vec_id)
         |    ORDER BY d DESC, cand.vec_id ASC
         |    LIMIT 1) nxt
         |  WHERE sel.r < 5)
         |SELECT CAST(r AS INT) AS "rank", id AS vec_id, min_dist FROM sel""".stripMargin
    },

    // per-vector: scale = max|x|/127, q_i = trunc(x_i/scale) toward
    "q_sim_project" -> {
      def fold(pp: Int) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"[CAST(embedding[i] AS DOUBLE) * ${graft.sim.Ann.weightSql(pp.toString, "i", 42L, 64)} " +
          s"for i in generate_series(1, 64)]), (s, x) -> s + x)"
      "SELECT vec_id, " +
        (1 to 8).map(i => s"${fold(i - 1)} AS rp$i").mkString(", ") +
        " FROM embeddings"
    },

    // zero (TRUNC, matching Spark's double->int cast), digest = the
    // foldHash arithmetic incl. its negative normalization, cosine of
    // v against its own codes (scale cancels)
    "q_sim_int8" -> {
      def dotVQ(a: String, b: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"[CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) " +
          s"for i in generate_series(1, len($a))]), (acc, x) -> acc + x)"
      val step = s"(d*131 + x % $P) % $P"
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |m AS (SELECT vec_id, v,
         |    list_max([abs(CAST(x AS DOUBLE)) for x in v]) / 127.0 AS scale
         |  FROM e),
         |qv AS (SELECT vec_id, v, scale,
         |    CASE WHEN scale = 0 THEN [CAST(0 AS BIGINT) for x in v]
         |         ELSE [CAST(TRUNC(CAST(x AS DOUBLE) / scale) AS BIGINT)
         |               for x in v] END AS q
         |  FROM m)
         |SELECT vec_id, scale,
         |  list_reduce(list_prepend(CAST(7 AS BIGINT), q),
         |    (d, x) -> CASE WHEN $step < 0 THEN $step + $P ELSE $step END)
         |    AS q_digest,
         |  ${dotVQ("v", "q")} / (sqrt(${dotVQ("v", "v")}) * sqrt(${dotVQ("q", "q")}))
         |    AS recon_cos
         |FROM qv""".stripMargin
    },

    "q_sim_topk_pq" -> pqOracleFor(Stride.toString),
    // stride derived from the corpus count IN SQL (integer-exact ceil,
    // same arithmetic as Ann.autoStride), so the oracle is correct at
    // ANY sf, not just the sf0.01 gate resolution
    "q_sim_topk_pq_auto" -> pqOracleFor(
      "(SELECT GREATEST(1, (count(*) + 255) // 256) FROM e)"),
    "q_sim_topk_brute" ->
      s"""WITH n AS (SELECT vec_id, embedding AS v FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS id_q, c.vec_id AS id_n,
         |    ${cosSql("q.v", "c.v")} AS cos
         |  FROM n q JOIN n c ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin,

    "q_sim_filtered_search" ->
      s"""WITH keepids AS (SELECT doc_id FROM documents
         |  WHERE ${TextQueries.qualityCondSql}),
         |n AS (SELECT vec_id, embedding AS v FROM embeddings
         |  JOIN keepids ON vec_id = doc_id),
         |q AS (SELECT vec_id, embedding AS v FROM embeddings
         |  WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT q.vec_id AS id_q, n.vec_id AS id_n,
         |    ${cosSql("q.v", "n.v")} AS cos
         |  FROM q JOIN n ON n.vec_id <> q.vec_id)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin,

    "q_sim_topk_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |b AS (SELECT vec_id, v, gt.tbl AS tbl,
         |  CAST(list_sum([CASE WHEN $planeDotSql > 0
         |    THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END
         |    for p in generate_series(0, ${Planes - 1})]) AS BIGINT) AS bkt
         |  FROM e, generate_series(0, ${TablesL - 1}) gt(tbl)),
         |cand AS (SELECT DISTINCT q.vec_id AS id_q, q.v AS vq,
         |    c.vec_id AS id_n, c.v AS vn
         |  FROM b c JOIN (SELECT * FROM b WHERE vec_id < $NQueries) q
         |    ON c.tbl = q.tbl AND c.bkt = q.bkt AND c.vec_id <> q.vec_id),
         |scored AS (SELECT id_q, id_n, ${cosSql("vq", "vn")} AS cos FROM cand)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin,

    "q_sim_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |b AS (SELECT vec_id, v, gt.tbl AS tbl,
         |  CAST(list_sum([CASE WHEN $planeDotSql > 0
         |    THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END
         |    for p in generate_series(0, ${Planes - 1})]) AS BIGINT) AS bkt
         |  FROM e, generate_series(0, ${TablesL - 1}) gt(tbl)),
         |cand AS (SELECT DISTINCT q.vec_id AS id_q, q.v AS vq,
         |    c.vec_id AS id_n, c.v AS vn
         |  FROM b c JOIN b q
         |    ON c.tbl = q.tbl AND c.bkt = q.bkt AND c.vec_id <> q.vec_id),
         |scored AS (SELECT id_q, id_n, ${cosSql("vq", "vn")} AS cos FROM cand)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $KGraph""".stripMargin,

    // Same construction as q_sim_knn_graph, with planes derived from
    // the corpus count IN SQL (smallest p in [2,48] with 2^p >=
    // ceil(n/16) — the integer-exact arithmetic of Ann.autoPlanes),
    // so the oracle tracks the engine at ANY sf.
    "q_sim_knn_graph_auto" -> {
      val w = Ann.weightSql("(tbl*pl + p)", "i", Seed, Dims)
      val pd = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[CAST(v[i] AS DOUBLE) * $w for i in generate_series(1, $Dims)]), " +
        s"(s, x) -> s + x)"
      // centering threshold: the fixed-point centroid's projection on
      // the same plane, folded in the same dim order (Ann.lshThresholds)
      val th = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[ca[i] * $w for i in generate_series(1, $Dims)]), " +
        s"(s, x) -> s + x)"
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |params AS (SELECT LEAST(48, coalesce((SELECT min(p)
         |    FROM generate_series(2, 48) gp(p)
         |    WHERE (CAST(1 AS BIGINT) << p) >=
         |      (SELECT (count(*) + 15) // 16 FROM e)), 48)) AS pl),
         |cent AS (SELECT list(c ORDER BY i) AS ca FROM (
         |  SELECT i, CAST(sum(CAST(floor(v[i] * 1048576.0) AS BIGINT)) AS DOUBLE)
         |      / (count(*) * 1048576.0) AS c
         |  FROM e, generate_series(1, $Dims) g(i) GROUP BY i)),
         |b AS (SELECT vec_id, v, gt.tbl AS tbl,
         |  CAST(list_sum([CASE WHEN $pd > $th
         |    THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END
         |    for p in generate_series(0, pl - 1)]) AS BIGINT) AS bkt
         |  FROM e, generate_series(0, ${TablesL - 1}) gt(tbl), params, cent),
         |cand AS (SELECT DISTINCT q.vec_id AS id_q, q.v AS vq,
         |    c.vec_id AS id_n, c.v AS vn
         |  FROM b c JOIN b q
         |    ON c.tbl = q.tbl AND c.bkt = q.bkt AND c.vec_id <> q.vec_id),
         |scored AS (SELECT id_q, id_n, ${cosSql("vq", "vn")} AS cos FROM cand)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $KGraph""".stripMargin
    },

    // IVF assignment/probe CTEs from the q_sim_topk_ivf oracle +
    // encode/ADC CTEs from the q_sim_topk_pq oracle, composed: score
    // only (probe-cell, member) pairs, by reconstruction cosine.
    "q_sim_topk_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % $Stride = 0),
         |ascore AS (SELECT e.vec_id AS id_n, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |cells AS (SELECT id_n, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_n ORDER BY ccos DESC, cid) AS rn
         |  FROM ascore) WHERE rn = 1),
         |pscore AS (SELECT q.vec_id AS id_q, c.cid, ${cosSql("q.v", "c.cv")} AS ccos
         |  FROM (SELECT * FROM e WHERE vec_id < $NQueries) q CROSS JOIN c),
         |probes AS (SELECT id_q, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY ccos DESC, cid) AS rn
         |  FROM pscore) WHERE rn <= $NProbe),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS kidx, v AS kv
         |  FROM e WHERE vec_id % $Stride = 0),
         |enc AS (SELECT vec_id, m, kidx FROM (
         |  SELECT n.vec_id, gm.m, cb.kidx,
         |    row_number() OVER (PARTITION BY n.vec_id, gm.m
         |      ORDER BY ${pqL2Sql("n.v", "cb.kv", "gm.m")}, cb.kidx) AS rn
         |  FROM e n CROSS JOIN generate_series(0, ${PqM - 1}) gm(m) CROSS JOIN cb)
         |  WHERE rn = 1),
         |pair AS (SELECT p.id_q, cells.id_n, enc.m,
         |    ${pqDotSql("q.v", "cb.kv", "enc.m")} AS dm,
         |    ${pqDotSql("cb.kv", "cb.kv", "enc.m")} AS cn2,
         |    ${pqDotSql("q.v", "q.v", "enc.m")} AS qn2
         |  FROM probes p
         |  JOIN cells ON cells.cid = p.cid AND cells.id_n <> p.id_q
         |  JOIN e q ON q.vec_id = p.id_q
         |  JOIN enc ON enc.vec_id = cells.id_n
         |  JOIN cb ON cb.kidx = enc.kidx),
         |agg AS (SELECT id_q, id_n,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dm ORDER BY m)), (s, x) -> s + x) AS dots,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(cn2 ORDER BY m)), (s, x) -> s + x) AS cn2s,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(qn2 ORDER BY m)), (s, x) -> s + x) AS qn2s
         |  FROM pair GROUP BY id_q, id_n),
         |scored AS (SELECT id_q, id_n, CASE WHEN qn2s = 0 OR cn2s = 0 THEN CAST(-2.0 AS DOUBLE) ELSE dots / (sqrt(qn2s) * sqrt(cn2s)) END AS cos FROM agg)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin,

    "q_sim_topk_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % $Stride = 0),
         |ascore AS (SELECT e.vec_id AS id_n, e.v AS vn, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |cells AS (SELECT id_n, vn, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_n ORDER BY ccos DESC, cid) AS rn
         |  FROM ascore) WHERE rn = 1),
         |pscore AS (SELECT q.vec_id AS id_q, q.v AS vq, c.cid,
         |    ${cosSql("q.v", "c.cv")} AS ccos
         |  FROM (SELECT * FROM e WHERE vec_id < $NQueries) q CROSS JOIN c),
         |probes AS (SELECT id_q, vq, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY ccos DESC, cid) AS rn
         |  FROM pscore) WHERE rn <= $NProbe),
         |scored AS (SELECT id_q, id_n, ${cosSql("vq", "vn")} AS cos
         |  FROM probes JOIN cells USING (cid) WHERE id_n <> id_q)
         |SELECT id_q, id_n, cos, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id_q ORDER BY cos DESC, id_n) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin
  )
}
