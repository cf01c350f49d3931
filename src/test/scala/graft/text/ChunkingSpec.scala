package graft.text

import graft.SparkSpec

/** Chunk layout invariants and a direct reconstruction check. */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], width: Int, stride: Int) =
    Chunking.charChunks(docs.toDF("doc_id", "text"), "doc_id", "text",
        width, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("offsets, clipping, and indices on a hand-laid-out doc") {
    val text = "0123456789abcdefghij" // 20 chars
    val got = run(Seq(7L -> text), width = 8, stride = 5)
    assert(got == Seq(
      (7L, 0L, 0L, "01234567"),
      (7L, 1L, 5L, "56789abc"),
      (7L, 2L, 10L, "abcdefgh"),
      (7L, 3L, 15L, "fghij"))) // final chunk clipped
  }

  test("every character covered when stride <= width; stride windows reconstruct the doc") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 20).foreach { _ =>
      val text = (0 until 1 + rnd.nextInt(120))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val width = 1 + rnd.nextInt(30)
      val stride = 1 + rnd.nextInt(width) // stride <= width
      val chunks = run(Seq(1L -> text), width, stride)
      // non-overlapping prefixes of each chunk reconstruct the text
      val rebuilt = chunks.map { case (_, _, start, t) =>
        t.take(math.min(stride, t.length)) }.mkString
      assert(rebuilt == text, s"width=$width stride=$stride text=$text")
      // starts are exactly 0, stride, 2*stride, ... < len
      assert(chunks.map(_._3) == (0L until text.length.toLong by stride.toLong))
    }
  }

  test("short docs give one clipped chunk; empty docs give none") {
    assert(run(Seq(1L -> "abc"), 10, 10) == Seq((1L, 0L, 0L, "abc")))
    assert(run(Seq(2L -> ""), 10, 10).isEmpty)
  }

  test("unicode: positions count code points, windows reconstruct (incl. non-BMP)") {
    val text = "héllo語λж😀x" // é, CJK, greek, cyrillic, emoji (surrogate pair)
    // take n CODE POINTS (String.take counts UTF-16 units and would
    // split the emoji's surrogate pair)
    def takeCp(s: String, n: Int): String =
      s.substring(0, s.offsetByCodePoints(0,
        math.min(n, s.codePointCount(0, s.length))))
    val chunks = run(Seq(1L -> text), width = 4, stride = 3)
    val rebuilt = chunks.map { case (_, _, _, t) => takeCp(t, 3) }.mkString
    assert(rebuilt == text, s"chunks=${chunks.map(_._4).mkString("|")}")
    // the emoji never splits across a chunk boundary's interior
    chunks.foreach { case (_, _, _, t) =>
      assert(!t.exists(c => Character.isHighSurrogate(c)) ||
        t.codePointCount(0, t.length) < t.length, t)
    }
  }
}
