package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HLL register sketch: estimator accuracy in the raw regime and the
  * order-independence that makes it hash-gate-safe. */
class HllSpec extends SparkSpec {

  private def rawEst(regs: Seq[Int]): Double =
    0.709 * 4096.0 / regs.map(r => 1.0 / (1L << r).toDouble).sum

  test("raw estimate within 25% of true cardinality at n >> m (10k distinct, m=64)") {
    val ds = spark.range(10000L)
      .select(NativeExpressions.charHash(
        format_string("id-%d", col("id")), 7L).as("h"))
    val regs = ds.agg(HllSketch.registers(col("h"), 64, 24).as("r"))
      .head().getSeq[Int](0)
    val est = rawEst(regs)
    info(f"est=$est%.0f true=10000")
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25,
      f"HLL raw estimate off: $est%.0f")
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val base = spark.range(2000L)
      .select(NativeExpressions.charHash(
        format_string("id-%d", col("id")), 7L).as("h"))
    val dup = base.union(base).union(base)
    val r1 = base.agg(HllSketch.registers(col("h"), 64, 24)).head().getSeq[Int](0)
    val r3 = dup.agg(HllSketch.registers(col("h"), 64, 24)).head().getSeq[Int](0)
    assert(r1 == r3)
  }

  test("registers are partition- and order-independent (merge = elementwise max)") {
    val ds = spark.range(5000L)
      .select(NativeExpressions.charHash(
        format_string("id-%d", col("id")), 7L).as("h"))
    val a = ds.agg(HllSketch.registers(col("h"), 64, 24)).head().getSeq[Int](0)
    val b = ds.repartition(13).agg(HllSketch.registers(col("h"), 64, 24))
      .head().getSeq[Int](0)
    val c = ds.orderBy(col("h").desc).coalesce(1)
      .agg(HllSketch.registers(col("h"), 64, 24)).head().getSeq[Int](0)
    assert(a == b && a == c)
  }
}
