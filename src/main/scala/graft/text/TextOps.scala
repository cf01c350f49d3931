package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, Portable}

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, and document
  * fingerprinting. All are per-row `Column` expressions (builtin
  * functions + HOFs, no UDFs) — pure map-side work that stays inside
  * WholeStageCodegen, so a 100 TB corpus is one full scan with zero
  * shuffle.
  *
  * Capability direction extends the reference's extension/validator
  * surface (SURVEY.md §2.6) from event attributes to document text.
  */
object TextOps {

  /** Whitespace tokenization. One-or-more whitespace, no empty tokens
    * (leading/trailing whitespace would otherwise produce ""). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation runs counted
    * separately (a cheap stand-in for a tokenizer's token count, the
    * usual "tokens" currency of training pipelines). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > 0)) +
      size(filter(split(text, "[A-Za-z0-9\\s]+"), t => length(t) > 0))

  /** Word k-grams ("shingles") joined by a single space; empty array
    * when the document has fewer than k tokens. Guarded because
    * Spark's `sequence(0, n)` with n &lt; 0 generates a *descending*
    * sequence rather than an empty one. */
  def shingles(text: Column, k: Int): Column =
    shinglesOf(tokens(text), k)

  /** [[shingles]] over an already-bound tokens column. Prefer
    * projecting `tokens(text)` to a named column first when the text
    * is long or the call is hot: lambda bodies re-evaluate their
    * argument expression per element (no codegen subexpression
    * elimination inside higher-order functions), so the inline form
    * pays O(words²) regex splits per document — measured 6× on
    * q_token_lift. */
  def shinglesOf(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))

  /** [[shingles]] via the native one-pass byte-level kernel (r18) —
    * byte-for-byte the same array for every input (spec-pinned
    * against the HOF form), one static codegen call per row instead
    * of a regex split plus a per-element lambda tree. Prefer this on
    * every hot path that only needs the gram strings; the HOF form
    * remains as the executable specification. */
  def shingleStrings(text: Column, k: Int): Column =
    NativeExpressions.shingleStrings(text, k)

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality metrics: doc length, token count, mean token length,
    * stopword ratio, alpha ratio — the standard cheap filters a
    * pretraining pipeline applies before anything expensive. Division
    * is double-by-double with identical operand order → portable.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    val n = size(t).cast("double")
    Seq(
      "n_chars_m" -> length(text).cast("long"),
      "n_tokens" -> size(t).cast("long"),
      "mean_token_len" ->
        (aggregate(t, lit(0L), (s, x) => s + length(x)).cast("double") / n),
      "stopword_ratio" ->
        (size(filter(t, x => lower(x).isin(Stopwords: _*))).cast("double") / n),
      "alpha_ratio" ->
        (length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
          length(text).cast("double")))
  }

  /** Repetition metrics (the Gopher-style within-document repetition
    * filters): fraction of duplicate lines and fraction of duplicate
    * word 2-grams — high values mark boilerplate/spam. Map-side array
    * arithmetic, zero shuffle. Empty docs → 0.0 (no repetition).
    */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    val nLines = size(lines)
    val grams = shingles(text, 2)
    val nGrams = size(grams)
    def dupFrac(xs: Column, n: Column): Column =
      when(n === 0, lit(0.0)).otherwise(
        (n - size(array_distinct(xs))).cast("double") / n.cast("double"))
    Seq(
      "dup_line_frac" -> dupFrac(lines, nLines),
      "dup_2gram_frac" -> dupFrac(grams, nGrams))
  }

  /** PII detection: email and long-digit-run (phone/id-like) counts,
    * plus the text with both classes redacted — the scrub step before
    * training. Conservative, regex-only (a real pipeline chains model
    * scrubbers after this cheap pass). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitRunRe = "[0-9][0-9 ()+.-]{7,}[0-9]"

  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe))).cast("long"),
    "n_digit_runs" -> size(regexp_extract_all(text, lit(DigitRunRe))).cast("long"))

  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      DigitRunRe, "<NUMBER>")

  /** Quality keep/drop decision composing the cheap metrics — the
    * actual FILTER a pretraining pipeline applies (metrics alone are
    * diagnostics). Empty documents are dropped outright (the ratio
    * denominators would be 0/NULL). Pure map-side boolean.
    */
  def qualityKeep(text: Column, minTokens: Int = 5, maxTokens: Int = 100000,
      minAlphaRatio: Double = 0.5, minStopwordRatio: Double = 0.01): Column = {
    val t = tokens(text)
    val n = size(t)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      length(text).cast("double")
    val stop = size(filter(t, x => lower(x).isin(Stopwords: _*))).cast("double") /
      n.cast("double")
    (n >= minTokens) && (n <= maxTokens) &&
      (length(text) > 0) && (alpha >= minAlphaRatio) &&
      (stop >= minStopwordRatio)
  }

  /** Marker-stopword language ID (the n-gram-profile heuristic reduced
    * to its highest-signal features: closed-class marker words). Score
    * per language = number of tokens in that language's marker set;
    * prediction = argmax, ties broken by language-code order. Returns
    * (lang, score) so callers can threshold on confidence.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "es", "no", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "ne", "un"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai", "you"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(t, x => lower(x).isin(markers: _*))).cast("long")
    }
  }

  /** Predicted language: argmax over [[langScores]], ties to the
    * lexicographically-first language code (greatest(…) then first
    * match, both engines evaluate identically). */
  def langPredict(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight ⇒ the FIRST matching lang in declaration (= sorted)
    // order wins, because earlier whens wrap later ones.
  }

  /** Mod-p fingerprinting (the sampling core of the winnowing
    * algorithm): hash every character k-gram with a rolling polynomial
    * hash, keep those ≡ 0 (mod p) — a deterministic ~1/p sample that
    * two documents share iff they share the underlying k-gram. Returns
    * a sorted array of selected hashes (the document's fingerprint
    * sketch).
    */
  def fingerprint(text: Column, k: Int = 8, p: Int = 8): Column =
    NativeExpressions.fingerprint(text, k, p)

  /** Interpreted-HOF form of [[fingerprint]] — the executable
    * specification the native rolling kernel is verified against
    * (TextOpsSpec asserts bit-equality). O(len·k) lambda trees; do
    * not use in hot paths.
    */
  def fingerprintSpec(text: Column, k: Int = 8, p: Int = 8): Column = {
    val n = length(text)
    val hashes = when(n < k, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(0), n - k),
        i => Portable.charHash(text.substr(i + lit(1), lit(k)))))
    array_sort(array_distinct(filter(hashes, h => h % p === 0)))
  }

  /** Train↔test contamination check (decontamination): pairs of
    * documents sharing at least `minShared` winnowing fingerprint
    * hashes, with the shared count. Inverted-index equi-join on the
    * hash — never an all-pairs array intersect — so the plan is the
    * same shape as the dedup candidate generators and survives corpus
    * scale; the ~1/p sampling of the fingerprint keeps the index a
    * fraction of the corpus. */
  def contaminationPairs(train: org.apache.spark.sql.DataFrame,
      test: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int = 8, p: Int = 8, minShared: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    def index(df: org.apache.spark.sql.DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(fingerprint(col(textCol), k, p)).as("_h"))
    index(train, "train_id").join(index(test, "test_id"), "_h")
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Scalar digest of a fingerprint sketch: order-sensitive fold
    * (d*131 + h) % P over the sorted hashes, seed 7 — one BIGINT the
    * driver's comparator can hash (its pandas sorter cannot handle
    * array cells). */
  def fingerprintDigest(fp: Column): Column =
    NativeExpressions.foldHash(fp, 7L)

  /** Corpus-level boilerplate signal (the cross-document counterpart
    * of [[repetitionMetrics]], RefinedWeb/CCNet-style): per document,
    * the fraction of its DISTINCT word n-grams that are "common" —
    * appearing in at least `minDf` documents. Templated/boilerplate
    * docs score high and get filtered before training.
    *
    * Scale shape: gram extraction is the native [[NativeExpressions
    * .shingleHashes]] kernel (map-side, distinct within doc, so the
    * groupBy counts document frequency directly); ONE shuffle
    * aggregates gram df; the hot-gram set (df ≥ minDf) is bounded by
    * total-gram-volume / minDf — small by construction — so the
    * join-back is a broadcast semi-join. No doc-to-doc pairs ever
    * materialize, unlike a naive pairwise-overlap formulation.
    */
  def boilerplate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 3, minDf: Int = 5)
      : org.apache.spark.sql.DataFrame = {
    val grams = docs.select(col(idCol),
      explode(NativeExpressions.shingleHashes(col(textCol), n)).as("_g"))
    val hot = grams.groupBy(col("_g"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf)
    val tot = docs.select(col(idCol),
      size(NativeExpressions.shingleHashes(col(textCol), n)).cast("long").as("n_grams"))
    val com = grams.join(broadcast(hot.select(col("_g"))), Seq("_g"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_common"))
    tot.join(com, Seq(idCol), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("common_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_common").cast("double") / col("n_grams").cast("double")))
  }
}
