package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The TF-IDF keyword score runs its product in DECIMAL(38,0)
  * (TextQueries q_text_keywords): tf · (N·10⁶ // df) breaches i64 at
  * the 100 TB operating point (tf ~ 10⁵ within one huge document ×
  * idf quotient ~ 10¹⁶ at N ~ 10¹⁰ docs) and Spark's i64 would wrap
  * (non-ANSI) or raise (ANSI, the Spark 4 default) where the ranking
  * must stay total. Same guard family as LiftArithmeticSpec; here the
  * score never leaves the plan (rank-only output), so what the spec
  * pins is the ORDERING's integrity, via the score values.
  */
class KeywordArithmeticSpec extends SparkSpec {

  import spark.implicits._

  private val DecimalScore =
    "CAST(tf AS DECIMAL(38,0)) *" +
      " ((CAST(n_docs AS DECIMAL(38,0)) * 1000000) div df)"
  private val I64Score = "tf * ((n_docs * 1000000) div df)"

  private def score(tf: Long, nDocs: Long, df: Long,
      exprSql: String): BigDecimal =
    Seq((tf, nDocs, df)).toDF("tf", "n_docs", "df")
      .select(expr(exprSql).cast("decimal(38,0)").as("s"))
      .head().getDecimal(0)

  private def truth(tf: Long, nDocs: Long, df: Long): BigInt =
    BigInt(tf) * ((BigInt(nDocs) * 1000000) / BigInt(df))

  test("decimal and i64 agree below the i64 bound") {
    val cases = Seq(
      (3L, 1000L, 7L),
      (250L, 1000000L, 12345L),
      // top of the safe regime: tf·(N·1e6//df) ~ 6e17
      (60000L, 10000000L, 1000L))
    cases.foreach { case (tf, n, df) =>
      val want = BigDecimal(truth(tf, n, df))
      assert(score(tf, n, df, DecimalScore) == want)
      assert(score(tf, n, df, I64Score) == want)
    }
  }

  test("decimal stays exact where i64 overflows (the 100 TB regime)") {
    // N ~ 1e10 docs, a rare term (df=2) in a pathological 1e5-token
    // document: score = 1e5 · 5e15 = 5e20 >> 2^63
    val (tf, n, df) = (100000L, 10000000000L, 2L)
    val want = BigDecimal(truth(tf, n, df))
    assert(score(tf, n, df, DecimalScore) == want)
    val i64 = try Some(score(tf, n, df, I64Score))
              catch { case _: org.apache.spark.SparkException => None
                      case _: ArithmeticException => None }
    assert(i64.forall(_ != want), s"i64 path unexpectedly exact: $i64")
  }
}
