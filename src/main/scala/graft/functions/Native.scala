package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight JVM kernels behind the native Catalyst expressions in
  * [[NativeExpressions]]. Same arithmetic as the [[Portable]] HOF
  * forms (validated against the DuckDB oracles), but evaluated as one
  * static call per row from generated code instead of interpreted
  * per-element lambda trees — the HOF forms cost ~3ms/row on shingle
  * hashing; these cost ~3µs.
  *
  * All methods are static-reachable so `doGenCode` can emit a direct
  * call and stay inside WholeStageCodegen.
  */
object Native {
  val P: Long = Portable.P
  val K: Long = Portable.Knuth

  /** Polynomial code-point hash: h = (h*131 + cp) % P over the code
    * points of [lo, hi) in `s`. */
  private def hashRange(s: String, lo: Int, hi: Int, seed: Long): Long = {
    var h = seed
    var i = lo
    while (i < hi) {
      val cp = s.codePointAt(i)
      h = (h * Portable.CharMul + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def charHash(s: UTF8String, seed: Long): Long = {
    val str = s.toString
    hashRange(str, 0, str.length, seed)
  }

  /** Token spans (start, end) over whitespace-separated tokens. */
  private def tokenSpans(s: String): Array[Int] = {
    val spans = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        spans += start; spans += i
      }
    }
    spans.toArray
  }

  /** Hash of every whitespace token, duplicates kept, document order. */
  def tokenHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    val spans = tokenSpans(s)
    val out = new Array[Long](spans.length / 2)
    var t = 0
    while (t < out.length) {
      out(t) = hashRange(s, spans(2 * t), spans(2 * t + 1), 7L)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Whitespace per Java regex `\s` — ASCII only: [ \t\n\x0B\f\r ].
    * A BYTE-level test is exact for UTF-8: multi-byte sequences only
    * use bytes ≥ 0x80, which never collide with these values. */
  @inline private def isRegexSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Word k-gram STRINGS (tokens joined by one space), duplicates
    * kept, document order — byte-for-byte equal to
    * `shinglesOf(tokens(text), k)` (split on `\s+`, drop empties,
    * `concat_ws(" ", ...)` windows) for EVERY input, built in one
    * byte-level pass over the UTF8String: no regex split, no
    * per-element lambda trees, no intermediate token array column.
    * The r17 plan audits measured the HOF form as the dominant map
    * cost of every shingle consumer (tokenize+explode re-paid per
    * scan); this kernel is a single static call per row inside
    * WholeStageCodegen. */
  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val spans = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && isRegexSpace(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isRegexSpace(bytes(i))) i += 1
        spans += start; spans += i
      }
    }
    val nTok = spans.length / 2
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - k + 1)
    var t = 0
    while (t <= nTok - k) {
      var len = k - 1 // k-1 separator spaces
      var j = 0
      while (j < k) { len += spans(2 * (t + j) + 1) - spans(2 * (t + j)); j += 1 }
      val buf = new Array[Byte](len)
      var o = 0
      j = 0
      while (j < k) {
        if (j > 0) { buf(o) = ' '.toByte; o += 1 }
        val s0 = spans(2 * (t + j)); val e0 = spans(2 * (t + j) + 1)
        System.arraycopy(bytes, s0, buf, o, e0 - s0)
        o += e0 - s0
        j += 1
      }
      out(t) = UTF8String.fromBytes(buf)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct hashes of word k-grams (tokens joined by one space) —
    * same value as charHash over the joined shingle string. */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val spans = tokenSpans(s)
    val nTok = spans.length / 2
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= nTok - k) {
      var h = 7L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * Portable.CharMul + ' '.toInt) % P
        h = hashRange(s, spans(2 * (i + j)), spans(2 * (i + j) + 1), h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature over a shingle-hash array (universal hash
    * family from [[Portable.ihash]]). */
  def minhashSig(shingles: ArrayData, n: Int, seed: Long): ArrayData = {
    val m = shingles.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val a = (K * (2 * i + 1) + seed) % P
      val b = (K * (i + 7) + seed * 31) % P
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val x = shingles.getLong(j) % P
        val h = (a * x + b) % P
        if (h < best) best = h
        j += 1
      }
      out(i) = if (m == 0) 0L else best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash over token hashes (duplicates weighted): bits
    * 0-29 vote on the token hash's bits, bits 30-59 on an independent
    * second hash h2 = (h·131 + 7) % P — both stay under 2^63 in every
    * intermediate, so the SQL oracle replicates them in plain BIGINT
    * arithmetic. The width is a SCALE property: bands of the
    * fingerprint are the candidate buckets, and 15-bit bands (32768
    * buckets/band) keep bucket load bounded where the former 30-bit
    * fingerprint's 8-bit bands (256 buckets) collapsed quadratically
    * on corpus growth. */
  def simhash(text: UTF8String): Long = {
    val th = tokenHashes(text)
    val n = th.numElements()
    val h2 = new Array[Long](n)
    var j = 0
    while (j < n) { h2(j) = (th.getLong(j) * 131L + 7L) % P; j += 1 }
    var fp = 0L
    var b = 0
    while (b < 60) {
      var vote = 0L
      j = 0
      while (j < n) {
        val src = if (b < 30) th.getLong(j) >> b else h2(j) >> (b - 30)
        vote += (src & 1L) * 2L - 1L
        j += 1
      }
      if (vote > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Random-hyperplane LSH bucket for one hash table: bit p set iff
    * the projection on global plane (table*planes+p) is positive.
    * Weight and fold arithmetic identical to [[graft.sim.Ann.weight]]/
    * `planeDot` (sequential double fold in dim order, 1-based i).
    */
  def lshBucket(v: ArrayData, table: Int, planes: Int, seed: Long,
      dims: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val gp = table * planes + p
      var s = 0.0
      var i = 1
      while (i <= dims) {
        val x = i.toLong + gp.toLong * dims
        val h1 = (x * K + seed) % P
        val h2 = (h1 * h1) % P
        val h = (h2 * K + x) % P % 2001L - 1000L
        s += v.getFloat(i - 1).toDouble * (h.toDouble / 1000.0)
        i += 1
      }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** Random-projection features (Johnson–Lindenstrauss): the SIGNED
    * projections [[lshBucket]] thresholds into bits, kept as values —
    * `outDims` sequential double folds against the same mixed-LCG
    * plane weights (global planes 0..outDims-1, so `outDims = planes`
    * of table 0 reproduces lshBucket's projections exactly). Identical
    * op-for-op to the SQL oracle's list_reduce fold → bit-equal
    * doubles. */
  def rpProject(v: ArrayData, outDims: Int, seed: Long, dims: Int): ArrayData = {
    val out = new Array[Double](outDims)
    var p = 0
    while (p < outDims) {
      var s = 0.0
      var i = 1
      while (i <= dims) {
        val x = i.toLong + p.toLong * dims
        val h1 = (x * K + seed) % P
        val h2 = (h1 * h1) % P
        val h = (h2 * K + x) % P % 2001L - 1000L
        s += v.getFloat(i - 1).toDouble * (h.toDouble / 1000.0)
        i += 1
      }
      out(p) = s
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** [[lshBucket]] with per-global-plane CENTERING thresholds: bit p
    * set iff the projection exceeds `th(table·planes + p)` instead of
    * zero. Subtracting the corpus centroid c from every vector shifts
    * each plane's projection by the constant Σᵢ cᵢ·wᵢ — so centered
    * SRP-LSH is exactly a threshold test against the UN-centered
    * projection, no per-row subtraction needed. On clustered (non-
    * isotropic) corpora, planes through the origin leave most vectors
    * on the same side and concentrate everything into a few hot
    * buckets (quadratic candidate blow-up); planes through the
    * centroid split the bulk ~50/50 per bit. */
  def lshBucketCentered(v: ArrayData, table: Int, planes: Int, seed: Long,
      dims: Int, th: Array[Double]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val gp = table * planes + p
      var s = 0.0
      var i = 1
      while (i <= dims) {
        val x = i.toLong + gp.toLong * dims
        val h1 = (x * K + seed) % P
        val h2 = (h1 * h1) % P
        val h = (h2 * K + x) % P % 2001L - 1000L
        s += v.getFloat(i - 1).toDouble * (h.toDouble / 1000.0)
        i += 1
      }
      if (s > th(gp)) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** Winnowing mod-p fingerprint sketch: the polynomial hash of every
    * character k-gram (code points, seed 7 — value-identical to
    * [[charHash]] over `substr(i, k)`), keeping hashes ≡ 0 (mod p),
    * sorted distinct. True O(len) rolling update — the leading code
    * point is removed via the precomputed 131^(k-1) weight instead of
    * re-folding each window (the interpreted-HOF form was O(len·k)
    * with a lambda tree per character; this is one static call).
    */
  def fingerprint(text: UTF8String, k: Int, p: Int): ArrayData = {
    val s = text.toString
    val cps = new Array[Long](s.length)
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(n) = cp; n += 1
      ci += Character.charCount(cp)
    }
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    var pw = 1L // 131^(k-1) mod P: weight of the window's leading char
    var j = 0
    while (j < k - 1) { pw = pw * Portable.CharMul % P; j += 1 }
    var seedK = 7L // seed contribution 7*131^k mod P, constant per window
    j = 0
    while (j < k) { seedK = seedK * Portable.CharMul % P; j += 1 }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var w = 0L // seedless window hash: sum cps(i+j)*131^(k-1-j) mod P
    j = 0
    while (j < k) { w = (w * Portable.CharMul + cps(j)) % P; j += 1 }
    var i = 0
    while (i <= n - k) {
      val h = (seedK + w) % P
      if (h % p == 0) sel.add(h)
      if (i < n - k) {
        var t = (w - cps(i) * pw % P) % P
        if (t < 0) t += P
        w = (t * Portable.CharMul + cps(i + k)) % P
      }
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  /** Every character-k-gram hash in POSITION order: out(i) =
    * charHash(substr(i, k), seed 7) — the fingerprint windows
    * ([[fingerprint]]) without the mod-p selection, so a position-
    * indexed inverted index can locate duplicated SPANS, not just
    * flag documents. Same O(len) rolling update; empty below k code
    * points. Positions count code points (the SQL oracle's substr
    * counts characters the same way). */
  def gramHashes(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val cps = new Array[Long](s.length)
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(n) = cp; n += 1
      ci += Character.charCount(cp)
    }
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    var pw = 1L
    var j = 0
    while (j < k - 1) { pw = pw * Portable.CharMul % P; j += 1 }
    var seedK = 7L
    j = 0
    while (j < k) { seedK = seedK * Portable.CharMul % P; j += 1 }
    val out = new Array[Long](n - k + 1)
    var w = 0L
    j = 0
    while (j < k) { w = (w * Portable.CharMul + cps(j)) % P; j += 1 }
    var i = 0
    while (i <= n - k) {
      out(i) = (seedK + w) % P
      if (i < n - k) {
        var t = (w - cps(i) * pw % P) % P
        if (t < 0) t += P
        w = (t * Portable.CharMul + cps(i + k)) % P
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Order-sensitive fold digest of a long array:
    * d = floorMod(d*131 + floorMod(x, P), P) — collapses an array
    * column to one scalar the driver's comparator can hash. The
    * digest is always a non-negative representative in [0, P), so
    * `graft_fold_hash` is well-defined over arbitrary bigint arrays.
    * For inputs already in [0, P) (every fingerprint/minhash array we
    * produce) this is bit-equal to the DuckDB oracle
    * list_reduce(list_prepend(seed, xs), (d,x)->(d*131+x)%P).
    */
  def foldHash(xs: ArrayData, seed: Long): Long = {
    val n = xs.numElements()
    var d = seed
    var i = 0
    while (i < n) {
      val x = xs.getLong(i) % P
      d = (d * Portable.CharMul + x) % P
      if (d < 0) d += P
      i += 1
    }
    d
  }

  /** Sequential-order dot product of two float arrays (same rounding
    * as the fold in [[Portable.dot]]). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** IVF coarse assignment: id of the max-cosine centroid for `v`,
    * ties to the smaller centroid id. `cents` MUST be in ascending
    * `centIds` order — the strict `>` then keeps the first (smallest
    * id) among cosine ties. The arithmetic is the same double fold as
    * `dotF(v,c) / (sqrt(dotF(v,v)) * sqrt(dotF(c,c)))`, so the result
    * is bit-identical to the former crossJoin+window argmax and the
    * DuckDB oracle. O(|cents|·dims) per row, zero shuffle.
    */
  def ivfAssign(v: ArrayData, centIds: Array[Long],
      cents: Array[Array[Float]]): Long = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; vv += x * x; i += 1 }
    val nv = math.sqrt(vv)
    var best = -1L
    var bestCos = Double.NegativeInfinity
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var d = 0.0
      var cc = 0.0
      var j = 0
      while (j < n) {
        val x = c(j).toDouble
        d += v.getFloat(j).toDouble * x
        cc += x * x
        j += 1
      }
      val cos = d / (nv * math.sqrt(cc))
      if (cos > bestCos) { bestCos = cos; best = centIds(ci) }
      ci += 1
    }
    best
  }

  /** Top-`nProbe` centroid ids for `v`, ordered (cosine desc, id asc).
    * Same ascending-id + stable-insertion contract as [[ivfAssign]];
    * map-side replacement for the probe-side crossJoin+window. */
  def ivfProbes(v: ArrayData, centIds: Array[Long],
      cents: Array[Array[Float]], nProbe: Int): ArrayData = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; vv += x * x; i += 1 }
    val nv = math.sqrt(vv)
    val m = math.min(nProbe, cents.length)
    val topCos = new Array[Double](m)
    val topId = new Array[Long](m)
    var filled = 0
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var d = 0.0
      var cc = 0.0
      var j = 0
      while (j < n) {
        val x = c(j).toDouble
        d += v.getFloat(j).toDouble * x
        cc += x * x
        j += 1
      }
      val cos = d / (nv * math.sqrt(cc))
      // first slot this strictly beats; equal cosines stay ahead, so
      // ascending-id iteration yields id-asc among ties
      var pos = filled
      while (pos > 0 && cos > topCos(pos - 1)) pos -= 1
      if (pos < m) {
        var k = math.min(filled, m - 1)
        while (k > pos) { topCos(k) = topCos(k - 1); topId(k) = topId(k - 1); k -= 1 }
        topCos(pos) = cos
        topId(pos) = centIds(ci)
        if (filled < m) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topId, filled))
  }

  /** Product-quantization encode: for each subspace m (covering dims
    * [m·sub, (m+1)·sub) where sub = dims / codebooks.length), the
    * 0-based index of the L2²-nearest codeword, ties to the smaller
    * index (strict `<` keeps the first). O(M·K·sub) = O(K·dims) per
    * row, zero shuffle — the codebooks ride along as a codegen
    * reference object. Output codes are M small ints: the 100 TB point
    * of PQ is that downstream scans read M bytes of code instead of
    * dims·4 bytes of raw vector.
    */
  def pqEncode(v: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val out = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cb = codebooks(mi)
      val sub = cb(0).length
      var best = -1
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = v.getFloat(off + j).toDouble - c(j).toDouble
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      off += sub
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** ADC (asymmetric distance computation) score: cosine of query
    * `qid`'s raw vector against the RECONSTRUCTION of `code`, via
    * per-query lookup tables — O(M) adds per pair instead of O(dims).
    * `tables(qi)(m)(k)` = per-subspace dot of query qi's subvector and
    * codeword k (dim-order fold); `qNorm2`/`cNorm2` are the matching
    * per-subspace self-dot sums, all accumulated in ascending-m order
    * (the SQL oracle mirrors exactly this fold structure). `qIds` must
    * be sorted ascending (binary-search lookup). Unknown qid → -2.0
    * (below any cosine) rather than an executor-killing throw; a
    * zero-norm query or reconstruction also scores -2.0 — the NaN a
    * 0/0 cosine would produce sorts ABOVE every double in Spark, so a
    * zero vector would otherwise take rank 1 in every top-k.
    */
  def pqAdc(qid: Long, code: ArrayData, qIds: Array[Long],
      tables: Array[Array[Array[Double]]], qNorm2: Array[Double],
      cNorm2: Array[Array[Double]]): Double = {
    val qi = java.util.Arrays.binarySearch(qIds, qid)
    if (qi < 0) return -2.0
    val t = tables(qi)
    val m = t.length
    var dot = 0.0
    var n2 = 0.0
    var mi = 0
    while (mi < m) {
      val k = code.getInt(mi)
      dot += t(mi)(k)
      n2 += cNorm2(mi)(k)
      mi += 1
    }
    if (n2 == 0.0 || qNorm2(qi) == 0.0) return -2.0
    dot / (math.sqrt(qNorm2(qi)) * math.sqrt(n2))
  }
}
