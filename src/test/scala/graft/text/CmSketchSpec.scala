package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min invariants under FORCED collisions (w smaller than the
  * vocabulary): estimates never undercount, every hash row conserves
  * total mass, and the sketch is partition-independent. */
class CmSketchSpec extends SparkSpec {

  import spark.implicits._

  private val words =
    (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i")) // skewed counts
  private val toks = words.toDF("token")

  test("est >= true for every token, exact when collision-free in some row") {
    val cells = CmSketch.sketch(toks, "token", d = 3, w = 4, seed = 7L)
    val probes = words.distinct.toDF("token")
    val est = CmSketch.estimate(cells, probes, d = 3, w = 4, seed = 7L)
    val truth = toks.groupBy("token").agg(count(lit(1)).as("true_n"))
    val bad = est.join(truth, "token").filter(col("est_n") < col("true_n"))
    assert(bad.count() == 0L, "CM must never undercount")
  }

  test("every hash row conserves total token mass") {
    val cells = CmSketch.sketch(toks, "token", d = 3, w = 4, seed = 7L)
    val rows = cells.groupBy("row").agg(sum("n").as("mass"))
      .select("mass").as[Long].collect().toSet
    assert(rows == Set(words.length.toLong))
  }

  test("sketch is partition-independent") {
    val a = CmSketch.sketch(toks, "token", 3, 4, 7L).collect().map(_.toSeq).toSet
    val b = CmSketch.sketch(toks.repartition(11), "token", 3, 4, 7L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
