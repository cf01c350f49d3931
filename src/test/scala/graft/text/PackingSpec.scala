package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing vs a sequential fold: the bucketed two-level
  * cumsum must give the EXACT global prefix sum for any bucket width,
  * and the chunk math must match a direct layout simulation. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private def naive(docs: Seq[(Long, Long)], seqLen: Long)
      : Map[Long, (Long, Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).map { case (id, n) =>
      val start = cum
      cum += n
      val first = start / seqLen
      val last = if (n > 0) (start + n - 1) / seqLen else first
      val chunks = if (n > 0) last - first + 1 else 0L
      id -> ((start, first, last, chunks))
    }.toMap
  }

  private def run(docs: Seq[(Long, Long)], seqLen: Long, width: Long) =
    Packing.pack(docs.toDF("doc_id", "n"), "doc_id", col("n"), seqLen, width)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("prefix sums exact for any bucket width (1, mid, one-bucket)") {
    val rnd = new scala.util.Random(20260815L)
    val docs = (0L until 200L).map(i => (i * 7 + rnd.nextInt(3), rnd.nextInt(40).toLong))
      .groupBy(_._1).map(_._2.head).toSeq // unique ids, gappy
    val want = naive(docs, 64L)
    Seq(1L, 37L, 1000000L).foreach { w =>
      assert(run(docs, 64L, w) == want, s"bucketWidth=$w")
    }
  }

  test("chunk math: straddles, exact fits, zero-token docs") {
    // seqLen 10; doc a fills 0..9 exactly, b straddles 10..24, c empty,
    // d lands inside bin 2
    val docs = Seq((1L, 10L), (2L, 15L), (3L, 0L), (4L, 3L))
    val got = run(docs, 10L, 100L)
    assert(got(1L) == ((0L, 0L, 0L, 1L)))   // exact fit: one chunk
    assert(got(2L) == ((10L, 1L, 2L, 2L)))  // straddles bins 1-2
    assert(got(3L) == ((25L, 2L, 2L, 0L)))  // empty: position, 0 chunks
    assert(got(4L) == ((25L, 2L, 2L, 1L)))  // shares bin 2
  }

  test("stream is gapless: every token position covered exactly once") {
    val docs = (1L to 50L).map(i => (i, (i % 7) + 1))
    val got = run(docs, 16L, 10L)
    val total = docs.map(_._2).sum
    // ends meet starts: sorted by tok_start, each start == previous end
    val sorted = docs.sortBy(_._1).map { case (id, n) => (got(id)._1, n) }
    sorted.sliding(2).foreach { case Seq((s1, n1), (s2, _)) =>
      assert(s2 == s1 + n1)
    }
    assert(sorted.last._1 + sorted.last._2 == total)
  }
}
