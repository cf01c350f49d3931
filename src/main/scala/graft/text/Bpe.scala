package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the
  * "train the tokenizer on the corpus" step of an LLM data pipeline,
  * in the shape that survives 100 TB.
  *
  * The classic observation (used by every production BPE trainer):
  * merges depend only on the WORD FREQUENCY TABLE, not on the corpus
  * — so the distributed pass is one word-count aggregation (linear
  * scan, map-side combine, vocabulary-sized result), and the merge
  * loop runs on the driver over that (bounded, Zipf-truncated) table.
  * Applying the trained vocabulary is again pure map-side work with
  * the merge ranks broadcast.
  *
  * Determinism: pair selection breaks count ties lexicographically,
  * so the merge list is a pure function of the word-frequency table.
  */
object Bpe {

  /** A trained tokenizer: ordered merge list (highest priority first). */
  case class Model(merges: Seq[(String, String)]) {
    private val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one word (no whitespace) into subword tokens. */
    def encodeWord(word: String): Seq[String] = {
      var parts = word.map(_.toString).toVector
      var done = parts.length <= 1
      while (!done) {
        var best = -1
        var bestAt = -1
        var i = 0
        while (i < parts.length - 1) {
          rank.get((parts(i), parts(i + 1))).foreach { r =>
            if (best == -1 || r < best) { best = r; bestAt = i }
          }
          i += 1
        }
        if (best == -1) done = true
        else {
          parts = (parts.take(bestAt) :+ (parts(bestAt) + parts(bestAt + 1))) ++
            parts.drop(bestAt + 2)
          if (parts.length <= 1) done = true
        }
      }
      parts
    }
  }

  /** Distributed word-frequency harvest: `(word, n)`, whitespace
    * tokenization, optionally truncated to the `maxWords` most
    * frequent words (count desc, word asc — deterministic). Truncation
    * bounds driver memory on open-vocabulary corpora; the long tail
    * contributes negligibly to pair counts (Zipf).
    */
  def wordCounts(docs: DataFrame, textCol: String,
      maxWords: Int = 1 << 20): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)

  /** Train `nMerges` merges from a word-frequency table (collected to
    * the driver — vocabulary-sized by construction, NOT corpus-sized).
    */
  def train(wordFreqs: Seq[(String, Long)], nMerges: Int): Model = {
    // word -> (symbol sequence, count)
    var words: Vector[(Vector[String], Long)] =
      wordFreqs.map { case (w, n) => (w.map(_.toString).toVector, n) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (parts, n) =>
        var i = 0
        while (i < parts.length - 1) {
          val p = (parts(i), parts(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (parts, n) =>
          if (parts.length < 2) (parts, n)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < parts.length) {
              if (i < parts.length - 1 && parts(i) == best._1 &&
                  parts(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += parts(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** End-to-end: harvest word counts, train on the driver. */
  def trainOn(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1 << 20): Model = {
    val freqs = wordCounts(docs, textCol, maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(freqs, nMerges)
  }

  /** Apply a trained model corpus-wide: adds `tokensCol`
    * (`array<string>` of subwords) — map-side only, model broadcast.
    * The per-word encode is cached per partition (words repeat
    * heavily), so cost is ~O(distinct words per partition).
    */
  def tokenize(spark: SparkSession, docs: DataFrame, textCol: String,
      tokensCol: String, model: Model): DataFrame = {
    import spark.implicits._
    val bModel = spark.sparkContext.broadcast(model)
    val others = docs.columns.filterNot(_ == textCol)
    val schema = docs.schema
    val rdd = docs.rdd.mapPartitions { it =>
      val m = bModel.value
      val cache = scala.collection.mutable.Map.empty[String, Seq[String]]
      it.map { row =>
        val text = Option(row.getAs[String](textCol)).getOrElse("")
        val toks = text.split("\\s+").iterator.filter(_.nonEmpty).flatMap {
          w => cache.getOrElseUpdate(w, m.encodeWord(w))
        }.toSeq
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ toks)
      }
    }
    spark.createDataFrame(rdd,
      schema.add(tokensCol, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
  }
}
