package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.Ppm

/** Randomized property tests for the pure-JVM kernels, against
  * independent naive reference implementations written here (NOT the
  * kernels' own code paths). Seeded — fully deterministic.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val P = Portable.P
  private val rnd = new scala.util.Random(20260812L)

  private def randString(maxLen: Int): String = {
    val pools = Seq(
      () => ('a' + rnd.nextInt(26)).toChar.toString,
      () => (' ' + rnd.nextInt(94)).toChar.toString,      // printable ASCII
      () => Seq("é", "Ü", "ß", "語", "λ", "ж")(rnd.nextInt(6)),
      () => new String(Character.toChars(0x1F600 + rnd.nextInt(16))))  // non-BMP
    (0 until rnd.nextInt(maxLen)).map(_ => pools(rnd.nextInt(pools.length))())
      .mkString
  }

  /** Independent O(len·k) reference: fold each window of code points. */
  private def naiveFingerprint(s: String, k: Int, p: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) Seq.empty
    else (0 to cps.length - k).map { i =>
      var h = 7L
      (i until i + k).foreach(j => h = (h * Portable.CharMul + cps(j)) % P)
      h
    }.filter(_ % p == 0).distinct.sorted
  }

  test("rolling fingerprint == naive per-window fold on 300 random unicode strings") {
    (1 to 300).foreach { _ =>
      val s = randString(120)
      val k = 2 + rnd.nextInt(9)
      val p = 2 + rnd.nextInt(15)
      val got = Native.fingerprint(UTF8String.fromString(s), k, p)
        .toLongArray().toSeq
      assert(got == naiveFingerprint(s, k, p), s"k=$k p=$p s=${s.take(40)}")
    }
  }

  test("charHash == naive code-point fold") {
    (1 to 200).foreach { _ =>
      val s = randString(80)
      var h = 7L
      s.codePoints().forEach(cp => h = (h * Portable.CharMul + cp) % P)
      assert(Native.charHash(UTF8String.fromString(s), 7L) == h)
    }
  }

  test("ppm encode/decode is the identity for random rasters; resize preserves shape") {
    (1 to 100).foreach { _ =>
      val w = 1 + rnd.nextInt(16)
      val h = 1 + rnd.nextInt(16)
      val ch = if (rnd.nextBoolean()) 3 else 1
      val px = Array.fill[Byte](w * h * ch)(rnd.nextInt(256).toByte)
      val img = Ppm.Image(w, h, ch, px)
      val rt = Ppm.decode(Ppm.encode(img)).get
      assert(rt.width == w && rt.height == h && rt.channels == ch)
      assert(rt.pixels.toSeq == px.toSeq)
      val (nw, nh) = (1 + rnd.nextInt(16), 1 + rnd.nextInt(16))
      val rs = Ppm.resize(img, nw, nh)
      assert(rs.pixels.length == nw * nh * ch)
      // corner pixel is exact under nearest-neighbor
      assert(rs.pixels(0) == px(0))
      assert(Ppm.gray(img).length == w * h)
    }
  }

  test("NCName: strings of valid chars validate; one invalid char anywhere breaks it") {
    val validStart = Seq("a", "Z", "_", "Ü", "é", "語")
    val validRest = validStart ++ Seq("0", "9", ".", "-", "·")
    (1 to 200).foreach { _ =>
      val s = validStart(rnd.nextInt(validStart.length)) +
        (0 until rnd.nextInt(12)).map(_ => validRest(rnd.nextInt(validRest.length))).mkString
      assert(graft.xes.XmlLexical.isNcName(s), s)
      val bad = Seq(":", " ", "#", "<")(rnd.nextInt(4))
      val pos = rnd.nextInt(s.length + 1)
      assert(!graft.xes.XmlLexical.isNcName(s.take(pos) + bad + s.drop(pos)))
    }
  }

  test("gramHashes: position i == charHash of the i-th k-gram, on 200 random unicode strings") {
    (1 to 200).foreach { _ =>
      val s = randString(60)
      val k = 1 + rnd.nextInt(8)
      val got = Native.gramHashes(UTF8String.fromString(s), k)
      val cps = s.codePoints().toArray
      if (cps.length < k) assert(got.numElements() == 0)
      else {
        assert(got.numElements() == cps.length - k + 1)
        (0 to cps.length - k).foreach { i =>
          var h = 7L
          (i until i + k).foreach(j => h = (h * Portable.CharMul + cps(j)) % P)
          assert(got.getLong(i) == h, s"pos $i of '$s' k=$k")
        }
      }
    }
  }

  test("pqAdc: zero-norm query or reconstruction scores the -2.0 sentinel, never NaN") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val qIds = Array(1L, 2L)
    val code = new GenericArrayData(Array(0, 0))
    // M=2 subspaces, K=1 codeword each; codeword dot products all zero
    // for query 1 (zero vector), non-zero for query 2
    val tables = Array(
      Array(Array(0.0), Array(0.0)),   // query 1 vs codewords
      Array(Array(0.5), Array(0.5)))   // query 2
    val qNorm2 = Array(0.0, 1.0)       // query 1 is the zero vector
    val cNormPos = Array(Array(1.0), Array(1.0))
    val cNormZero = Array(Array(0.0), Array(0.0)) // zero reconstruction
    // zero-norm query → sentinel (a NaN would sort ABOVE every cosine)
    assert(Native.pqAdc(1L, code, qIds, tables, qNorm2, cNormPos) == -2.0)
    // zero-norm reconstruction → sentinel
    assert(Native.pqAdc(2L, code, qIds, tables, qNorm2, cNormZero) == -2.0)
    // healthy pair still scores a real cosine
    val ok = Native.pqAdc(2L, code, qIds, tables, qNorm2, cNormPos)
    assert(!ok.isNaN && ok > -2.0 && ok <= 1.0)
    // unknown qid keeps its sentinel
    assert(Native.pqAdc(99L, code, qIds, tables, qNorm2, cNormPos) == -2.0)
  }

  /** Independent reference for the r18 shingle-string kernel: the
    * exact column semantics it replaces — Java regex `\s+` split
    * (Spark's split), drop empties, join k-windows with one space. */
  private def naiveShingleStrings(s: String, k: Int): Seq[String] = {
    val toks = s.split("\\s+", -1).filter(_.nonEmpty).toSeq
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
  }

  test("shingleStrings == regex-split+window reference on 400 whitespace-rich unicode strings") {
    // whitespace-rich generator: every regex-\s char, plus Unicode
    // whitespace the regex does NOT match (U+00A0, U+2003, U+2028) —
    // the kernel must treat those as TOKEN bytes exactly like \s+
    val wsPool = Seq(" ", "\t", "\n", "\u000B", "\f", "\r",
      "  ", " \t ", "\u00A0", "\u2003", "\u2028")
    def randDoc(): String =
      (0 until rnd.nextInt(30)).map { _ =>
        if (rnd.nextBoolean()) wsPool(rnd.nextInt(wsPool.length))
        else randString(8)
      }.mkString
    (1 to 400).foreach { _ =>
      val s = randDoc()
      val k = 1 + rnd.nextInt(4)
      val got = Native.shingleStrings(UTF8String.fromString(s), k)
      val exp = naiveShingleStrings(s, k)
      assert(got.numElements() == exp.length, s"k=$k s=${s.take(40)}")
      (0 until got.numElements()).foreach { i =>
        assert(got.getUTF8String(i).toString == exp(i),
          s"pos $i k=$k s=${s.take(40)}")
      }
    }
    // degenerate shapes
    assert(Native.shingleStrings(UTF8String.fromString(""), 3).numElements() == 0)
    assert(Native.shingleStrings(UTF8String.fromString("   "), 1).numElements() == 0)
    assert(Native.shingleStrings(UTF8String.fromString("a b"), 3).numElements() == 0)
  }
}
