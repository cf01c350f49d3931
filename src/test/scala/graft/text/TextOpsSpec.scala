package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Native, Portable}
import org.apache.spark.unsafe.types.UTF8String

/** Text-operator specs. The load-bearing one: the native rolling
  * fingerprint kernel must be bit-equal to the interpreted-HOF
  * executable specification (`TextOps.fingerprintSpec`, the form the
  * DuckDB oracle mirrors) on adversarial inputs — short docs, exact
  * window-length docs, repeats, and non-ASCII code points.
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    "",
    "short",
    "exactly8",                             // len == k: one window
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaaa",             // degenerate repeats
    "abcabcabcabcabcabcabcabc",
    "Überweisung für müde Bären — naïve café",  // non-ASCII code points
    ("lorem ipsum dolor sit amet " * 40).trim)

  test("fingerprint: native rolling kernel == HOF executable spec") {
    val df = docs.toDF("text")
    val got = df.select(
      TextOps.fingerprint(col("text"), k = 8, p = 8).as("native"),
      TextOps.fingerprintSpec(col("text"), k = 8, p = 8).as("spec"))
      .as[(Seq[Long], Seq[Long])].collect()
    got.zip(docs).foreach { case ((native, spec), d) =>
      assert(native == spec, s"doc=$d")
    }
    // non-vacuous: the long docs must actually select some hashes
    assert(got.last._1.nonEmpty)
  }

  test("fingerprint: every selected hash is ≡0 mod p, sorted distinct") {
    val fp = Native.fingerprint(
      UTF8String.fromString(docs.last), 8, 8)
    val arr = fp.toLongArray()
    assert(arr.forall(h => h % 8 == 0 && h >= 0 && h < Portable.P))
    assert(arr.toSeq == arr.toSeq.sorted && arr.toSet.size == arr.length)
  }

  test("foldHash digest matches a sequential Scala fold") {
    val xs = Array(16L, 4096L, 123456L, 999999000L)
    val expect = xs.foldLeft(7L)((d, x) => (d * Portable.CharMul + x) % Portable.P)
    val got = Seq(Tuple1(xs.toSeq)).toDF("fp")
      .select(TextOps.fingerprintDigest(col("fp")))
      .as[Long].head()
    assert(got == expect)
    // empty sketch digests to the seed
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("fp")
      .select(TextOps.fingerprintDigest(col("fp"))).as[Long].head()
    assert(empty == 7L)
  }

  test("foldHash is well-defined (non-negative, in [0,P)) for arbitrary bigint input") {
    // graft_fold_hash is registered as a general SQL function — negative
    // and >=P elements must still produce a canonical representative
    val nasty = Seq(
      Seq(-1L, Long.MinValue, Long.MaxValue, Portable.P, Portable.P + 5L),
      Seq(-999999999999L, 0L, -7L),
      Seq.range(-50L, 50L))
    nasty.foreach { xs =>
      val digest = Seq(Tuple1(xs)).toDF("fp")
        .select(TextOps.fingerprintDigest(col("fp"))).as[Long].head()
      assert(digest >= 0L && digest < Portable.P, s"$xs -> $digest")
    }
    // in-range inputs are unchanged by the normalization (oracle parity)
    val inRange = Array(16L, 4096L, 123456L, 999999000L)
    val expect = inRange.foldLeft(7L)((d, x) => (d * Portable.CharMul + x) % Portable.P)
    val got = Seq(Tuple1(inRange.toSeq)).toDF("fp")
      .select(TextOps.fingerprintDigest(col("fp"))).as[Long].head()
    assert(got == expect)
  }
}
