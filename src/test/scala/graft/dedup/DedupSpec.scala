package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup unit specs complementing the driver oracles: the maxDf skew
  * guard must stay internally consistent, and exact dedup's hashed
  * group key must reproduce the full-text grouping.
  */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("jaccardPairs maxDf: sizes come from the filtered universe (identical docs stay at 1.0)") {
    val near = "alpha beta gamma delta epsilon zeta eta theta"
    // 10 fillers all share the hot prefix shingle "alpha beta gamma"
    val docs = (Seq((1L, near), (2L, near)) ++
      (3L to 12L).map(i => (i, s"alpha beta gamma filler$i only$i here$i")))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
        tau = 0.9, maxDf = Some(5L))
      .as[(Long, Long, Double)].collect()
    // the identical pair must survive at exactly 1.0: its hot shingle
    // is dropped from BOTH numerator and denominator
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("prefix-filtered Jaccard == full inverted index at the same tau") {
    // randomized corpus with planted near-dups and shared hub tokens
    val rnd = new scala.util.Random(13)
    val vocab = ('a' to 't').map(c => s"$c$c$c")
    def doc(): String =
      (1 to (8 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 60L).map(i => (i, doc()))
    // plant near-dups: copy with one word appended
    val dups = (1L to 10L).map(i => (100L + i, base((i - 1).toInt)._2 + " zzz"))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
        k = 3, tauNum = 4, tauDen = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pref == full)
    assert(full.nonEmpty) // the planted dups must actually surface
  }

  test("chunkDups: aligned repeats dedupe to the first holder; unaligned repeats are missed (fixed-boundary contract)") {
    val block = ("x" * 90) + ("y" * 30) // 120 chars, one chunk at width 120
    val docs = Seq(
      (1L, block),             // first holder (doc 1, start 0)
      (2L, block),             // aligned copy -> reported
      (3L, "ab" + block),      // shifted by 2: chunk boundaries differ -> missed
      (4L, "unique " * 20)
    ).toDF("doc_id", "text")
    val dups = Dedup.chunkDups(docs, "doc_id", "text",
        width = 120, stride = 120, minChunkLen = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(dups == Set((2L, 0L, 1L, 0L)))
    // span dedup (position-indexed) DOES catch the shifted copy — the
    // two operators are tiers of the same signal, not substitutes
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text",
        k = 30, minLen = 60, maxDf = 1000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(spans.contains((1L, 3L)))
  }

  test("clusters: star contraction finds component minima (multi-hop chains)") {
    // components: {1,2,3} triangle-ish, {5,6} pair, {8,9,10,11} a
    // 3-hop chain — the chain forces multiple contraction rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (8L, 9L), (9L, 10L), (10L, 11L)).toDF("id_a", "id_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L, 11L -> 8L)
    // driver union-find path (default threshold)
    val small = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(small == expect)
    // distributed star-contraction path (threshold forced to 0)
    val dist = Dedup.clusters(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == expect)
  }

  test("clusters: a 10^4-node chain resolves in logarithmic rounds (r9 caveat)") {
    // The adversarial shape for label propagation: one path component
    // of length 10^4, where hash-to-min needs O(diameter) = 10^4
    // rounds. Alternating large-star/small-star must contract it in
    // O(log² n) — empirically ~10 rounds; the bound pinned here is a
    // loose 25.
    val n = 10000L
    val chain = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1L).as("b"))
    val (labels, rounds) = Dedup.starComponents(chain)
    info(s"chain of $n contracted in $rounds rounds")
    assert(rounds <= 25, s"chain contraction took $rounds rounds")
    val bad = labels.filter(col("cluster_id") =!= 0L).count()
    assert(bad == 0L, s"$bad nodes not labeled with the component min")
    assert(labels.count() == n)
  }

  test("clusters: self-loop-only nodes keep their singleton label on BOTH paths") {
    // review finding: the star-contraction branch filtered self-loops
    // before clustering, vanishing a node whose only edge is (a, a) —
    // cluster membership must not depend on which side of
    // driverMaxEdges the edge count lands
    val pairs = Seq((7L, 7L), (1L, 2L), (3L, 3L)).toDF("id_a", "id_b")
    val expect = Map(7L -> 7L, 1L -> 1L, 2L -> 1L, 3L -> 3L)
    val uf = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(uf == expect)
    val star = Dedup.clusters(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(star == expect)
  }

  test("clusters: star contraction equals union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    // sparse random graph: ~150 edges over 120 nodes → mixed component
    // shapes (isolated pairs, trees, cycles, a giant component)
    val pairs = (0 until 150).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val uf = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    val star = Dedup.clusters(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(star == uf)
  }

  test("minhash-union aggregate == signature of the unioned shingle sets") {
    import graft.functions.{MinHashUnionAgg, Native}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("alpha beta gamma delta", "gamma delta epsilon zeta",
      "zeta eta theta iota kappa")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(Dedup.minhashSignature(
        Dedup.shingleHashes(col("text"), 2), 16, 42L).as("sig"))
    val union = df.agg(MinHashUnionAgg.minhashUnion(col("sig")))
      .as[Seq[Long]].head()
    // signature of the union of all shingle sets, computed directly
    val allShingles = texts.flatMap(t =>
      Native.shingleHashes(UTF8String.fromString(t), 2).toLongArray()).distinct
    val direct = Native.minhashSig(
      new GenericArrayData(allShingles.toArray), 16, 42L).toLongArray().toSeq
    assert(union == direct)
  }

  test("exact dedup on hashed keys == grouping by normalized text") {
    val docs = Seq(
      (1L, "Hello World"), (2L, "  hello world  "), (3L, "HELLO WORLD"),
      (4L, "different"), (5L, "Different"), (6L, "unique doc")
    ).toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((1L, 3L, false)))
    assert(got(2L) == ((1L, 3L, true)))
    assert(got(3L) == ((1L, 3L, true)))
    assert(got(4L) == ((4L, 2L, false)))
    assert(got(5L) == ((4L, 2L, true)))
    assert(got(6L) == ((6L, 1L, false)))
  }
}
