package graft.text

import graft.SparkSpec

/** BPE training with hand-traced merges and corpus-wide application. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("train: merge order follows counts with lexicographic ties") {
    // corpus: low ×3, lower ×1
    // pairs: (l,o)=4, (o,w)=4, (w,e)=1, (e,r)=1
    //   → (l,o) on the lexicographic tie, then (lo,w)=4,
    //     then the (e,r) / (low,e) tie → (e,r).
    val m = Bpe.train(Seq(("low", 3L), ("lower", 1L)), nMerges = 3)
    assert(m.merges == Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    assert(m.encodeWord("lower") == Seq("low", "er"))
    assert(m.encodeWord("low") == Seq("low"))
    assert(m.encodeWord("wool") == Seq("w", "o", "o", "l"))
  }

  test("train stops when no pairs remain") {
    val m = Bpe.train(Seq(("ab", 5L)), nMerges = 10)
    assert(m.merges == Seq(("a", "b")))
  }

  test("trainOn: distributed word harvest feeds the same merge loop") {
    val docs = Seq("low low", "low lower").toDF("text")
    val m = Bpe.trainOn(docs, "text", nMerges = 3)
    assert(m.merges == Seq(("l", "o"), ("lo", "w"), ("e", "r")))
  }

  test("tokenize: broadcast model, per-partition word cache, schema appended") {
    val docs = Seq((1L, "low lower"), (2L, "wool")).toDF("id", "text")
    val m = Bpe.train(Seq(("low", 3L), ("lower", 1L)), nMerges = 3)
    val out = Bpe.tokenize(spark, docs, "text", "toks", m)
      .as[(Long, String, Seq[String])].collect().sortBy(_._1)
    assert(out(0)._3 == Seq("low", "low", "er"))
    assert(out(1)._3 == Seq("w", "o", "o", "l"))
  }

  test("wordCounts truncation is deterministic (count desc, word asc)") {
    val docs = Seq("b b a a c").toDF("text")
    val wc = Bpe.wordCounts(docs, "text", maxWords = 2)
      .as[(String, Long)].collect().toSeq
    assert(wc == Seq(("a", 2L), ("b", 2L)))
  }
}
