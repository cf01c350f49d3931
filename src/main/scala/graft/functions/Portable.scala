package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic arithmetic — hash/fold primitives that an
  * external ANSI-SQL engine (the driver's DuckDB oracle) can replicate
  * bit-for-bit. Everything is i64 arithmetic kept below 2^63 by
  * reducing mod P=1e9+7 at every step (Spark wraps on overflow while
  * DuckDB errors, so intermediate values must never overflow), and
  * every floating-point reduction is a *sequential fold in array
  * order* (`aggregate` HOF here, `list_reduce` in the oracle) so the
  * double rounding is identical across engines.
  *
  * These are all codegen'd builtin expressions (HOFs + arithmetic) —
  * no UDFs — so they stay inside WholeStageCodegen and scale as pure
  * map-side work.
  */
object Portable {
  val P = 1000000007L
  val CharMul = 131L
  val Knuth = 2654435761L

  /** Polynomial rolling hash over the characters of a string column:
    * h = fold(chars, seed, (h,c) -> (h*131 + ascii(c)) % P).
    * Oracle: list_reduce(list_prepend(seed, [ord(c) for c in
    * string_split(s,'')]), (h,c) -> (h*131+c) % P).
    */
  def charHash(s: Column, seed: Long = 7L): Column =
    aggregate(split(s, ""), lit(seed),
      (h, c) => (h * lit(CharMul) + ascii(c)) % lit(P))

  /** SQL text of [[charHash]] over expression `s` (DuckDB dialect). */
  def charHashSql(s: String, seed: Long = 7L): String =
    s"list_reduce(list_prepend(CAST($seed AS BIGINT), " +
      s"[CAST(ord(c) AS BIGINT) for c in string_split($s,'')]), " +
      s"(h,c) -> (h*$CharMul+c) % $P)"

  /** The i-th universal hash of an already-hashed value x:
    * ((a_i*x + b_i) mod P) with a_i,b_i derived arithmetically from
    * (i, seed) — the MinHash family.
    */
  def ihash(x: Column, i: Int, seed: Long): Column = {
    val a = (Knuth * (2 * i + 1) + seed) % P
    val b = (Knuth * (i + 7) + seed * 31) % P
    (lit(a) * (x % lit(P)) + lit(b)) % lit(P)
  }

  def ihashSql(x: String, i: Int, seed: Long): String = {
    val a = (Knuth * (2 * i + 1) + seed) % P
    val b = (Knuth * (i + 7) + seed * 31) % P
    s"(($a*($x % $P) + $b) % $P)"
  }

  /** Sequential double sum in array order — identical rounding to the
    * oracle's list_reduce. `xs` must be ArrayType(DoubleType).
    */
  def seqSum(xs: Column): Column =
    aggregate(xs, lit(0.0), (s, v) => s + v)

  /** Dot product of two float-array columns, element-cast to double,
    * folded sequentially in index order.
    */
  def dot(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Oracle SQL for [[dot]]: 1-indexed positional comprehension. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in generate_series(1, len($a))]), " +
      s"(s,v) -> s+v)"

  /** Cosine similarity with fully sequential folds (portable). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
