package graft.text

import graft.SparkSpec

/** Integer BM25: hand-traced scores on a tiny corpus, a naive local
  * reference on real docs, matching-docs-only + tie-break ordering.
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  /** Same integer contract, computed locally. */
  private def naive(docs: Seq[(Long, String)], terms: Seq[String], k: Int): Seq[(Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = docs.size.toLong
    val tTot = toks.map(_._2.size.toLong).sum
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val scored = toks.flatMap { case (id, ts) =>
      val dl = ts.size.toLong
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0L) 0L
        else {
          val idf = (1000L * (2 * n - 2 * df(t) + 1)) / (2 * df(t) + 1)
          val sat = (22000L * tf * tTot) / (10 * tTot * tf + 3 * tTot + 9 * dl * n)
          idf * sat
        }
      }.sum
      if (terms.exists(ts.contains)) Some(id -> score) else None
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("hand-traced two-doc corpus") {
    // docs: (1, "a b a"), (2, "b c"). terms: a, c. N=2, T=5.
    // df(a)=1, df(c)=1 -> idf = (1000*(4-2+1))//3 = 1000.
    // doc1: dl=3, tf(a)=2: sat = (22000*2*5)//(10*5*2+3*5+9*3*2) = 220000//169 = 1301
    //   score = 1000*1301 = 1301000
    // doc2: dl=2, tf(c)=1: sat = (22000*1*5)//(10*5+15+9*2*2) = 110000//101 = 1089
    //   score = 1089000
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, "text", Seq("a", "c"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1301000L), (2L, 1089000L)))
  }

  test("matches the naive reference on real documents (top-20)") {
    val terms = Seq("dup", "spark", "hash", "key")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("CAST(doc_id AS LONG) AS doc_id", "text")
    val got = Bm25.topK(docs, "text", terms, 20).as[(Long, Long)].collect().toSeq
    val want = naive(docs.as[(Long, String)].collect().toSeq, terms, 20)
    assert(got == want)
  }

  test("docs without any query term are excluded") {
    val docs = Seq((1L, "x y z"), (2L, "a x")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, "text", Seq("a"), 10).as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(2L))
  }

  test("score ties break by doc_id ascending") {
    // identical docs => identical scores
    val docs = Seq((5L, "a b"), (3L, "a b"), (9L, "a b")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, "text", Seq("a"), 2).as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(3L, 5L))
    assert(got.map(_._2).distinct.length == 1)
  }
}
