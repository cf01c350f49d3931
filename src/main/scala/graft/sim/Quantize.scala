package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage/bandwidth op for
  * an embedding corpus (float32 → int8 is 4× fewer bytes scanned and
  * shuffled; PQ compresses further but loses per-dim access).
  * Symmetric per-vector scheme: scale = max|x| / 127, q_i =
  * trunc(x_i / scale) ∈ [-127, 127]; dequantization is q·scale, and
  * since cosine is scale-invariant, similarity search can score
  * int8 vectors directly — no dequant pass.
  *
  * Determinism contract (hash-gate): TRUNCATION toward zero, not
  * rounding — Spark's double→int cast truncates while SQL CAST
  * rounds half-even, so the oracle uses TRUNC explicitly and both
  * engines see bit-identical doubles in, identical ints out. Zero
  * vectors quantize to all zeros with scale 0.
  *
  * Everything is one zero-shuffle scan; nothing leaves the executor.
  */
object Quantize {

  /** max |x_i| as a sequential double fold (order-independent). */
  def maxAbs(v: Column): Column =
    aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x.cast("double"))))

  /** Per-vector symmetric scale: max|x| / 127 (0.0 for zero vectors). */
  def int8Scale(v: Column): Column = maxAbs(v) / lit(127.0)

  /** int8 codes: trunc(x_i / scale) toward zero; all-zero when
    * scale = 0. Emitted as INT (the arithmetic domain is [-127, 127];
    * parquet stores it narrow either way). */
  def int8Codes(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => (x.cast("double") / scale).cast("int")))

  /** Sequential dim-order dot of two arrays as doubles. */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, p) => s + p)

  /** Cosine of the original vector against its own int8 codes — the
    * reconstruction-quality diagnostic (scale cancels in cosine, so
    * codes are compared directly). Oracle-replicable folds. */
  def reconCos(v: Column, q: Column): Column =
    dotD(v, q) / (sqrt(dotD(v, v)) * sqrt(dotD(q, q)))

  /** Quantized table: (idCol, scale, q). */
  def int8(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs.select(col(idCol), col(vecCol).as("_v"))
      .withColumn("scale", int8Scale(col("_v")))
      .withColumn("q", int8Codes(col("_v"), col("scale")))
      .select(col(idCol), col("scale"), col("q"))
}
