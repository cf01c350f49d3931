package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable.{Knuth, P}
import graft.sim.Ann

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk_brute" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K)
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
    // Full-corpus k-NN graph (every vector is a query) — the batch
    // graph build behind dedup clustering and diversity sampling.
    // Same multi-table LSH equi-join; candidate volume is linear in
    // bucket collisions, never |corpus|².
    "q_sim_knn_graph" -> { (s, dir) =>
      Ann.knnGraph(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        KGraph, TablesL, Planes, Seed, Dims)
    }
  )

  private def dot(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) " +
      s"for i in generate_series(1, len($a))]), (s, v) -> s + v)"

  private def cosSql(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Projection of v on global plane (l*Planes+p), dims 1-based i. */
  private val planeDotSql = {
    val w = Ann.weightSql(s"(tbl*$Planes + p)", "i", Seed, Dims)
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST(v[i] AS DOUBLE) * $w for i in generate_series(1, $Dims)]), " +
      s"(s, x) -> s + x)"
  }

  def oracle: Map[String, String] = Map(
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
