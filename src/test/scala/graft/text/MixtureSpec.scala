package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temperature-scaled mixture weights: hand-checked two-group case +
  * the sampling invariants on the real documents table. */
class MixtureSpec extends SparkSpec {

  import spark.implicits._

  test("two groups at alpha=0.5: weights follow sqrt shares") {
    // sizes 81 and 9 → p = .9, .1; √p ∝ 3, 1 → w = .75, .25
    val docs = (Seq.fill(81)("big") ++ Seq.fill(9)("small"))
      .toDF("grp").withColumn("sz", lit(10L))
    val w = Mixture.groupWeights(docs, "grp", col("sz"), alpha = 0.5)
      .select("grp", "p", "w", "boost")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(math.abs(w("big")._1 - 0.9) < 1e-12)
    assert(math.abs(w("big")._2 - 0.75) < 1e-12)
    assert(math.abs(w("small")._2 - 0.25) < 1e-12)
    // tail group gets upsampled, head downsampled
    assert(w("small")._3 > 1.0 && w("big")._3 < 1.0)
  }

  test("alpha=1 keeps the natural distribution") {
    val docs = (Seq.fill(7)("a") ++ Seq.fill(3)("b"))
      .toDF("grp").withColumn("sz", lit(1L))
    val w = Mixture.groupWeights(docs, "grp", col("sz"), alpha = 1.0)
      .select("grp", "p", "w").as[(String, Double, Double)].collect()
    w.foreach { case (_, p, wt) => assert(math.abs(p - wt) < 1e-12) }
  }

  test("invariants on the documents table: weights sum to 1, tail boosted") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val rows = Mixture.groupWeights(docs, "lang", col("n_chars"), alpha = 0.5)
      .select("p", "w", "boost").as[(Double, Double, Double)].collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    // minimum-share group is boosted, maximum-share group is damped
    val byP = rows.sortBy(_._1)
    assert(byP.head._3 >= 1.0 && byP.last._3 <= 1.0)
  }
}
