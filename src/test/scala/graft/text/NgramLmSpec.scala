package graft.text

import graft.SparkSpec

/** Pooled bigram LM score against hand-computed counts. */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed corpus: counts, smoothing, pooling") {
    // corpus: "a b a b", "a b x", "solo"
    // unigrams: a:3 b:3 x:1 solo:1 -> V = 4
    // bigrams:  (a,b):3 (b,a):1 (b,x):1
    // doc 1 = (a,b),(b,a),(a,b): num = 7+3+7 = 17, den = 10+10+10 = 30
    // doc 2 = (a,b),(b,x):       num = 7+3   = 10, den = 10+10    = 20
    // doc 3: one token, no bigrams -> absent
    val docs = Seq((1L, "a b a b"), (2L, "a b x"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = NgramLm.scorePooled(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((3L, 17.0 / 30.0)))
    assert(got(2L) == ((2L, 10.0 / 20.0)))
  }

  test("random corpora == sequential count reference (15 rounds)") {
    val rnd = new scala.util.Random(20260819L)
    (1 to 15).foreach { round =>
      val words = Seq("a", "b", "c", "dd")
      val docs = (1L to (2 + rnd.nextInt(5)).toLong).map { i =>
        i -> (0 until rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.length)))
          .mkString(" ")
      }
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val uni = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.size }
      val vocab = uni.size
      val bigrams = toks.map { case (id, ts) => id -> ts.zip(ts.drop(1)) }
      val bi = bigrams.flatMap(_._2).groupBy(identity).map { case (g, xs) => g -> xs.size }
      val want = bigrams.filter(_._2.nonEmpty).map { case (id, gs) =>
        val num = gs.map { g => 2L * bi(g) + 1L }.sum
        val den = gs.map { g => 2L * uni(g._1) + vocab.toLong }.sum
        id -> ((gs.size.toLong, num.toDouble / den.toDouble))
      }.toMap
      val got = NgramLm.scorePooled(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == want, s"round $round docs=$docs")
    }
  }

  test("repeated corpus-typical text outscores a one-off continuation") {
    val docs = ((1L to 9L).map(i => i -> "the cat sat on the mat") :+
      (10L -> "the cat sat on zzz qqq")).toDF("doc_id", "text")
    val got = NgramLm.scorePooled(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(10L))
    assert((1L to 9L).map(got).distinct.size == 1) // identical docs tie
  }
}
