package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25-style ranked retrieval over a document column, in exact
  * integer arithmetic (the gate-determinism contract: no logarithms,
  * no double divisions — every score is an i64 built from floor
  * divisions, so ranking is bit-identical across engines).
  *
  * Scoring contract (the "rational BM25" variant, k1 = 6/5, b = 3/4):
  * with N docs, T total tokens, dl = doc token count, tf = term count
  * in doc, df = docs containing the term,
  *
  *   idf_w(t)      = (1000 · (2N − 2·df + 1)) div (2·df + 1)
  *   sat_milli(t,d)= (22000 · tf · T) div (10·T·tf + 3·T + 9·dl·N)
  *   score_fp(d)   = Σ_t idf_w(t) · sat_milli(t, d)
  *
  * idf_w is BM25's idf *argument* (N−df+½)/(df+½) scaled ×1000 with
  * the halves cleared (monotone in the classical ln-idf, so per-term
  * ordering is identical); sat_milli is exactly
  * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) ×1000 with avgdl = T/N and all
  * denominators cleared (multiply through by 10·T). Matching docs only
  * (some tf > 0).
  *
  * Scale shape: tf and dl are map-side `size(filter(tokens))` per doc
  * — no explode, no per-token shuffle. The corpus scalars (N, T, df
  * per term) are one tiny aggregate broadcast back; scoring is then
  * map-side and top-k is a TakeOrdered. One full scan, zero wide
  * shuffles of per-token data.
  *
  * Overflow bound: 22000·tf·T must stay below 2^63 — holds to
  * T ≈ 4·10^14 total tokens at tf ≤ 10^3.
  *
  * Capability direction: extends the reference's attribute-filter
  * surface (SURVEY.md §2.3; /root/reference/src/stream/filter.rs:55)
  * from boolean selection to ranked relevance retrieval.
  */
object Bm25 {

  /** Per-doc (dl, tf_i...) projection for the given terms. */
  private def docStats(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val toks: Column = TextOps.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"tf$i")
    }
    docs.select(
      (col("doc_id") +: size(toks).cast("long").as("dl") +: tfCols): _*)
  }

  /** Top-k (doc_id, score_fp) by (score_fp desc, doc_id asc) among
    * docs that contain at least one query term.
    */
  def topK(docs: DataFrame, textCol: String, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // Materialize the per-doc stats ONCE (r17): `d` feeds both the
    // corpus-scalar aggregate and the scoring pass — uncached, each
    // reference re-ran the tokenize + per-term filter projection over
    // the whole corpus (2 scans in the r17 plan audit). The stats
    // table is (2 + |terms|) longs per doc — NARROW but O(docs) ROWS
    // (r18, advisor item: the r17 "tiny at any scale" claim was
    // wrong), so the checkpoint is size-gated: above the cutoff both
    // consumers re-run the pruned tokenize projection instead of
    // pinning a corpus-row-count frame in executor storage.
    val d = graft.ops.LocalCkpt.ifSmall(
      docStats(docs, textCol, terms), docs.count())
    val dfCols = terms.indices.flatMap { i =>
      Seq(sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    }
    val scalars = d.agg(
      count(lit(1)).cast("long").as("n"),
      (sum("dl").cast("long").as("t") +: dfCols): _*)
    // Tiny 1-row scalar table: broadcast cross join, then map-side score.
    val scored = d.crossJoin(broadcast(scalars))
    val termScore: Column = terms.indices.map { i =>
      val idf = expr(s"(1000 * (2*n - 2*df$i + 1)) div (2*df$i + 1)")
      val sat = when(col(s"tf$i") === 0L, 0L).otherwise(
        expr(s"(22000 * tf$i * t) div (10*t*tf$i + 3*t + 9*dl*n)"))
      idf * sat
    }.reduce(_ + _)
    scored
      .where(terms.indices.map(i => col(s"tf$i") > 0L).reduce(_ || _))
      .select(col("doc_id"), termScore.as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Oracle SQL (DuckDB dialect) for [[topK]] over the `documents`
    * table — same integer arithmetic, `//` for `div`.
    */
  def oracleSql(terms: Seq[String], k: Int): String = {
    val toks = "[x for x in string_split_regex(text, '\\s+') if len(x) > 0]"
    val tfSel = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len([x for x in $toks if x = '$t']) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfSel = terms.indices.map { i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(", ")
    val score = terms.indices.map { i =>
      s"((1000 * (2*n - 2*df$i + 1)) // (2*df$i + 1)) * " +
        s"(CASE WHEN tf$i = 0 THEN 0 ELSE (22000 * tf$i * t) // (10*t*tf$i + 3*t + 9*dl*n) END)"
    }.mkString(" + ")
    val anyTf = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl, $tfSel
       |  FROM documents),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS t, $dfSel
       |  FROM d)
       |SELECT doc_id, CAST($score AS BIGINT) AS score_fp
       |FROM d, s
       |WHERE $anyTf
       |ORDER BY score_fp DESC, doc_id ASC
       |LIMIT $k""".stripMargin
  }
}
