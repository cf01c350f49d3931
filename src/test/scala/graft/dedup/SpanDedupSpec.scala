package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact substring-span dedup vs a naive reference that works on REAL
  * substrings (not hashes): at these sizes hash equality must coincide
  * with string equality, so any rolling-hash or island-merge defect
  * shows up as a span mismatch. */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  /** O(pairs · len²) reference: matched k-gram positions by string
    * equality, merged along diagonals. */
  private def naiveSpans(docs: Seq[(Long, String)], k: Int, minLen: Int,
      includeSelf: Boolean = false): Set[(Long, Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(Long, Long, Long, Long, Long)]
    for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib || (includeSelf && ia == ib)
    } {
      val matches = for {
        pa <- 0 to ta.length - k
        pb <- 0 to tb.length - k
        if ia != ib || pa < pb
        if ta.substring(pa, pa + k) == tb.substring(pb, pb + k)
      } yield (pa, pb)
      matches.groupBy { case (pa, pb) => pa - pb }.foreach { case (diag, ms) =>
        val ps = ms.map(_._1).sorted
        // islands of consecutive positions
        var runStart = ps.head
        var prev = ps.head
        def emit(endPos: Int): Unit = {
          val len = endPos - runStart + k
          if (len >= minLen)
            out += ((ia, ib, runStart.toLong, (runStart - diag).toLong, len.toLong))
        }
        ps.tail.foreach { p =>
          if (p != prev + 1) { emit(prev); runStart = p }
          prev = p
        }
        emit(prev)
      }
    }
    out.result()
  }

  private def naiveCoverage(spans: Set[(Long, Long, Long, Long, Long)])
      : Map[Long, Long] = {
    val intervals = spans.toSeq.flatMap { case (a, b, sa, sb, len) =>
      Seq((a, sa, sa + len), (b, sb, sb + len)) }.distinct
    intervals.groupBy(_._1).map { case (doc, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      var total = 0L
      var curS = sorted.head._1
      var curE = sorted.head._2
      sorted.tail.foreach { case (s, e) =>
        if (s > curE) { total += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      total += curE - curS
      doc -> total
    }
  }

  private def run(docs: Seq[(Long, String)], k: Int, minLen: Int,
      maxDf: Long = 1000000L) = {
    val df = docs.toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(df, "doc_id", "text", k, minLen, maxDf)
    val got = spans.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val cov = SpanDedup.spanCoverage(spans).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (got, cov)
  }

  test("planted spans: shared sentence found once, maximal, both offsets right") {
    // the shared region includes the flanking spaces both docs carry:
    // " <sentence> " — 45 chars starting at the space (offsets 4 / 8)
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      1L -> s"AAAA $shared BBBB",
      2L -> s"CCCCCCCC $shared DD",
      3L -> "nothing in common here at all, completely different")
    val expectLen = shared.length.toLong + 2
    val (got, cov) = run(docs, k = 8, minLen = 20)
    assert(got == Set((1L, 2L, 4L, 8L, expectLen)))
    assert(cov == Map(1L -> expectLen, 2L -> expectLen))
  }

  test("identical docs: one span covering the whole text") {
    val t = "identical documents share everything, start to end"
    val (got, cov) = run(Seq(10L -> t, 20L -> t), k = 8, minLen = 10)
    assert(got == Set((10L, 20L, 0L, 0L, t.length.toLong)))
    assert(cov == Map(10L -> t.length.toLong, 20L -> t.length.toLong))
  }

  test("random small-alphabet corpora == naive substring reference (spans + coverage)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 12).foreach { round =>
      val n = 3 + rnd.nextInt(4)
      val docs = (1L to n.toLong).map { i =>
        // tiny alphabet → frequent genuine shared substrings
        i -> (0 until (20 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val k = 4 + rnd.nextInt(3)
      val minLen = k + rnd.nextInt(6)
      val (got, cov) = run(docs, k, minLen)
      val want = naiveSpans(docs, k, minLen)
      assert(got == want, s"round $round k=$k minLen=$minLen docs=$docs")
      assert(cov == naiveCoverage(want), s"coverage round $round")
    }
  }

  test("random corpora under a small maxDf == df-filtered naive reference") {
    // the capped single-pass collect must agree with the declarative
    // two-pass semantics (df in [2, maxDf]) on arbitrary data, where
    // dropped hub grams BREAK islands into shorter spans
    val rnd = new scala.util.Random(20260818L)
    (1 to 10).foreach { round =>
      val n = 3 + rnd.nextInt(4)
      val docs = (1L to n.toLong).map { i =>
        i -> (0 until (20 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val k = 4 + rnd.nextInt(3)
      val minLen = k
      val maxDf = 2 + rnd.nextInt(5)
      // df per k-gram string across all docs and positions
      val df = docs.flatMap { case (_, t) =>
        (0 to t.length - k).map(p => t.substring(p, p + k)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = naiveSpansDfFiltered(docs, k, minLen, maxDf, df)
      val (got, _) = run(docs, k, minLen, maxDf.toLong)
      assert(got == want, s"round $round k=$k maxDf=$maxDf docs=$docs")
    }
  }

  /** [[naiveSpans]] with the hub cutoff: matched positions only count
    * when their gram's df is within [2, maxDf]. */
  private def naiveSpansDfFiltered(docs: Seq[(Long, String)], k: Int,
      minLen: Int, maxDf: Int, df: Map[String, Long])
      : Set[(Long, Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(Long, Long, Long, Long, Long)]
    for ((ia, ta) <- docs; (ib, tb) <- docs if ia < ib) {
      val matches = for {
        pa <- 0 to ta.length - k
        pb <- 0 to tb.length - k
        g = ta.substring(pa, pa + k)
        if g == tb.substring(pb, pb + k) && df(g) <= maxDf
      } yield (pa, pb)
      matches.groupBy { case (pa, pb) => pa - pb }.foreach { case (diag, ms) =>
        val ps = ms.map(_._1).sorted
        var runStart = ps.head
        var prev = ps.head
        def emit(endPos: Int): Unit = {
          val len = endPos - runStart + k
          if (len >= minLen)
            out += ((ia, ib, runStart.toLong, (runStart - diag).toLong, len.toLong))
        }
        ps.tail.foreach { p =>
          if (p != prev + 1) { emit(prev); runStart = p }
          prev = p
        }
        emit(prev)
      }
    }
    out.result()
  }

  test("capped collect is partitioning-independent (partial merge + serde path)") {
    // many partitions force map-side partial buffers through
    // serialize/deserialize/merge; the span set must not change
    val rnd = new scala.util.Random(20260819L)
    val docs = (1L to 6L).map { i =>
      i -> (0 until 80).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString }
    val df1 = docs.toDF("doc_id", "text")
    val df7 = docs.toDF("doc_id", "text").repartition(7)
    def spans(df: org.apache.spark.sql.DataFrame) =
      SpanDedup.duplicatedSpans(df, "doc_id", "text", k = 4, minLen = 4,
        maxDf = 5L).collect().map(_.toSeq).toSet
    assert(spans(df7) == spans(df1))
  }

  test("maxDf boundary is exact: df == maxDf kept, df == maxDf + 1 dropped") {
    // the shared 8-gram block occurs once per doc: df = number of docs
    val t = "abcdefgh"
    val docs3 = Seq(1L -> t, 2L -> t, 3L -> t)
    // df = 3 == maxDf: kept — all 3 pairs surface
    val (kept, _) = run(docs3, k = 8, minLen = 8, maxDf = 3L)
    assert(kept.map(s => (s._1, s._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // df = 4 == maxDf + 1: dropped — the capped buffer must prove
    // overflow with its one extra slot, not silently truncate to maxDf
    val (dropped, _) = run(docs3 :+ (4L -> t), k = 8, minLen = 8, maxDf = 3L)
    assert(dropped.isEmpty)
  }

  test("docs shorter than k and empty docs contribute nothing") {
    val (got, cov) = run(Seq(1L -> "abc", 2L -> "abc", 3L -> ""), k = 8, minLen = 8)
    assert(got.isEmpty && cov.isEmpty)
  }

  test("maxDf hub cutoff drops over-shared grams (documented recall trade)") {
    val t = "zzzzzzzzzzzzzzzzzzzzzzzz" // every 8-gram identical: df = 17*4 > 3
    val docs = Seq(1L -> t, 2L -> t, 3L -> t, 4L -> t)
    val (got, _) = run(docs, k = 8, minLen = 8, maxDf = 3L)
    assert(got.isEmpty) // all grams are hubs above the cutoff
    // without the cutoff, self-similar text matches on EVERY diagonal
    // (one maximal span per diagonal per pair — the reference agrees)
    val (full, _) = run(docs, k = 8, minLen = 8, maxDf = 1000L)
    assert(full == naiveSpans(docs, k = 8, minLen = 8))
    assert(full.exists { case (a, b, sa, sb, len) =>
      a == 1L && b == 2L && sa == 0L && sb == 0L && len == t.length.toLong })
  }

  private def naiveScrub(docs: Seq[(Long, String)],
      spans: Set[(Long, Long, Long, Long, Long)]): Map[Long, String] = {
    val cuts = spans.toSeq.map { case (_, b, _, sb, len) => (b, sb, sb + len) }
      .groupBy(_._1)
    docs.map { case (id, text) =>
      val keep = new StringBuilder
      val dead = Array.fill(text.length)(false)
      cuts.getOrElse(id, Nil).foreach { case (_, s, e) =>
        (s.toInt until math.min(e.toInt, text.length)).foreach(dead(_) = true) }
      text.zipWithIndex.foreach { case (c, i) => if (!dead(i)) keep += c }
      id -> keep.toString
    }.toMap
  }

  test("scrub: later docs lose the span, first occurrence survives, others untouched") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      1L -> s"AAAA $shared BBBB",
      2L -> s"CCCCCCCC $shared DD",
      3L -> "nothing in common here at all, completely different")
    val df = docs.toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(df, "doc_id", "text", 8, 20, 1000L)
    val got = SpanDedup.scrub(df, "doc_id", "text", spans).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == docs(0)._2)            // earliest occurrence kept whole
    assert(got(2L) == "CCCCCCCCDD")          // " shared " cut out
    assert(got(3L) == docs(2)._2)            // untouched doc passes through
  }

  test("scrub: fully-duplicated doc comes back empty; random corpora == naive cut reference") {
    val t = "identical documents share everything, start to end"
    val df = Seq(10L -> t, 20L -> t).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(df, "doc_id", "text", 8, 10, 1000L)
    val got = SpanDedup.scrub(df, "doc_id", "text", spans).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> t, 20L -> ""))

    val rnd = new scala.util.Random(20260814L)
    (1 to 8).foreach { round =>
      val docs = (1L to (3 + rnd.nextInt(3)).toLong).map { i =>
        i -> (0 until (15 + rnd.nextInt(50))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val k = 4 + rnd.nextInt(3)
      val df2 = docs.toDF("doc_id", "text")
      val sp = SpanDedup.duplicatedSpans(df2, "doc_id", "text", k, k, 1000000L)
      val want = naiveScrub(docs, naiveSpans(docs, k, k))
      val got2 = SpanDedup.scrub(df2, "doc_id", "text", sp).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got2 == want, s"round $round k=$k docs=$docs")
    }
  }

  test("self-spans: periodic text yields one off-diagonal span per period shift") {
    // "abcd abcd abcd" (14 chars): diag -5 run = one maximal span of
    // length 9 starting at (0, 5); diag -10 gives (0, 10) length 4
    val df = Seq(1L -> "abcd abcd abcd").toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(df, "doc_id", "text",
        k = 4, minLen = 4, maxDf = 1000L, includeSelf = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == naiveSpans(Seq(1L -> "abcd abcd abcd"), 4, 4, includeSelf = true))
    assert(got.contains((1L, 1L, 0L, 5L, 9L)), got.toString)
    // scrubbing the self-spans keeps exactly the first period
    val scrubbed = SpanDedup.scrub(df, "doc_id", "text",
      SpanDedup.duplicatedSpans(df, "doc_id", "text", 4, 4, 1000L,
        includeSelf = true)).collect()
    assert(scrubbed.map(_.getString(1)).toSeq == Seq("abcd "))
  }

  test("random corpora with self-matching == naive reference") {
    val rnd = new scala.util.Random(20260817L)
    (1 to 8).foreach { round =>
      val docs = (1L to (2 + rnd.nextInt(3)).toLong).map { i =>
        i -> (0 until (20 + rnd.nextInt(40))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
      }
      val k = 4 + rnd.nextInt(2)
      val got = SpanDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, k, 1000000L, includeSelf = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == naiveSpans(docs, k, k, includeSelf = true),
        s"round $round k=$k docs=$docs")
    }
  }

  test("decontamination composition: benchmark text scrubbed from train, test side untouched") {
    val leak = "the exact benchmark answer string here"
    val docs = Seq(
      5L -> s"benchmark question $leak end",         // test slice (id < 20)
      30L -> s"training prose $leak more prose",     // leaks the benchmark
      31L -> "clean training document with no leak"
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text",
        k = 8, minLen = 8, maxDf = 64L)
      .filter(col("id_a") < 20 && col("id_b") >= 20)
    val out = SpanDedup.scrub(docs.filter(col("doc_id") >= 20),
        "doc_id", "text", spans)
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(30L, 31L)) // test docs never in the output
    assert(!out(30L).contains(leak), s"leak survived: ${out(30L)}")
    assert(out(31L) == "clean training document with no leak")
  }

  test("minLen below k is rejected") {
    intercept[IllegalArgumentException] {
      SpanDedup.duplicatedSpans(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", k = 8, minLen = 4, maxDf = 10L)
    }
  }
}
