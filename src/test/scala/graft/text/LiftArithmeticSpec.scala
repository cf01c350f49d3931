package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The collocation lift runs its numerator in DECIMAL(38,0)
  * (TextQueries q_token_lift): n_ab·n_total·1000 breaches i64 on
  * large corpora and Spark's non-ANSI i64 would WRAP SILENTLY where
  * DuckDB errors — the exact divergence the gate exists to prevent.
  * This spec pins the decimal expression against BigInt ground truth
  * in both regimes: values where i64 is still exact, and values where
  * the old i64 expression provably wraps.
  */
class LiftArithmeticSpec extends SparkSpec {

  import spark.implicits._

  private val DecimalLift =
    "(CAST(n_ab AS DECIMAL(38,0)) * n_total * 1000)" +
      " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
  private val I64Lift = "(n_ab * n_total * 1000) div (n_a * n_b)"

  private def lift(nAb: Long, nTotal: Long, nA: Long, nB: Long,
      exprSql: String): Long =
    Seq((nAb, nTotal, nA, nB)).toDF("n_ab", "n_total", "n_a", "n_b")
      .select(expr(exprSql).as("lift")).head().getLong(0)

  private def truth(nAb: Long, nTotal: Long, nA: Long, nB: Long): Long =
    ((BigInt(nAb) * BigInt(nTotal) * 1000) /
      (BigInt(nA) * BigInt(nB))).toLong

  test("decimal and i64 agree below the i64 bound") {
    val cases = Seq(
      (5L, 1000L, 10L, 20L),
      (123L, 987654L, 456L, 789L),
      // near the top of the safe regime: n_ab·n_total·1000 ~ 9e17
      (30000L, 30000000L, 50000L, 60000L))
    cases.foreach { case (ab, t, a, b) =>
      val want = truth(ab, t, a, b)
      assert(lift(ab, t, a, b, DecimalLift) == want)
      assert(lift(ab, t, a, b, I64Lift) == want)
    }
  }

  test("decimal stays exact where i64 overflows (the 100 TB regime)") {
    // n_total ~ 1e10 tokens, hub bigram n_ab ~ 1e8:
    // numerator 1e21 >> 2^63 ≈ 9.2e18
    val (ab, t, a, b) = (100000000L, 10000000000L, 500000000L, 400000000L)
    val want = truth(ab, t, a, b) // = 5000: well-defined, small
    assert(lift(ab, t, a, b, DecimalLift) == want)
    // and the old i64 expression really does break in this regime:
    // ANSI (Spark 4 default) raises ARITHMETIC_OVERFLOW, non-ANSI
    // wraps to a wrong value — both diverge from DuckDB's error
    val i64 = try Some(lift(ab, t, a, b, I64Lift))
              catch { case _: org.apache.spark.SparkException => None
                      case _: ArithmeticException => None }
    assert(i64.forall(_ != want), s"i64 path unexpectedly exact: $i64")
  }
}
