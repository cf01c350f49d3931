package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model for quality scoring — the CCNet-style
  * signal ("how much does this doc look like the corpus?") with the
  * scoring statistic chosen for cross-engine determinism: instead of
  * log-perplexity (transcendental — libm vs JVM `log` can differ in
  * the last ulp and break a hash gate), each document is scored by the
  * arithmetic MEAN of its bigrams' add-k-smoothed conditional
  * probabilities
  *
  *   p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha·V)
  *
  * — and the per-doc aggregate is the POOLED ratio
  *
  *   score = Σ(2·c(w1,w2) + 1) / Σ(2·c(w1) + V)        (alpha = 1/2)
  *
  * rather than the mean of the per-bigram fractions: both sums are
  * exact BIGINT arithmetic and only ONE double division happens per
  * doc, so the result is bit-identical across engines (a distributed
  * mean of doubles is association-order-dependent and cannot be
  * hash-gated). Monotone the same way: repeated corpus-typical
  * continuations score high, rare continuations drag the ratio down.
  *
  * Scale shape: the model IS two distributed aggregates (bigram and
  * unigram counts — one shuffle each, map-side partial); scoring is
  * two equi-joins (per-doc bigrams against the count tables, keyed by
  * the gram — AQE broadcasts them when small) and one per-doc
  * aggregate. No driver materialization anywhere: the model never
  * leaves the cluster.
  */
object NgramLm {

  /** Per-doc bigram rows: (idCol, _w1, _w2), one per adjacent token
    * pair in [[TextOps.tokens]] order. */
  private def docBigrams(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col(idCol),
        slice(col("_t"), lit(1), size(col("_t")) - 1).as("_a"),
        slice(col("_t"), lit(2), size(col("_t")) - 1).as("_b"))
      .select(col(idCol), explode(arrays_zip(col("_a"), col("_b"))).as("_bg"))
      .select(col(idCol), col("_bg._a").as("_w1"), col("_bg._b").as("_w2"))

  /** Score every doc by the pooled smoothed bigram probability against
    * the corpus's own bigram model: (idCol, n_bigrams, lm_score). Docs
    * with fewer than two tokens are absent (they have no bigrams). */
  def scorePooled(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = docBigrams(docs, idCol, textCol)
    val uni = docs.select(explode(TextOps.tokens(col(textCol))).as("_w1"))
      .groupBy("_w1").agg(count(lit(1)).as("_c1"))
    val vocab = uni.count() // one scalar: |V|
    val bi = grams.groupBy("_w1", "_w2").agg(count(lit(1)).as("_c2"))
    grams
      .join(bi, Seq("_w1", "_w2"))
      .join(uni, Seq("_w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("_c2") * 2L + 1L).as("_num"),
        sum(col("_c1") * 2L + lit(vocab)).as("_den"))
      .withColumn("lm_score", col("_num") / col("_den"))
      .select(col(idCol), col("n_bigrams"), col("lm_score"))
  }
}
