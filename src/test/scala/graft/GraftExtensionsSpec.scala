package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** The SQL-registered kernels must be the SAME expressions as the
  * Scala column API — value-identical on real data, and usable from
  * `spark.sql` alone.
  */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("every graft_* SQL function exists and matches the column API") {
    val df = Seq((1L, "the quick brown fox the quick"),
      (2L, "lorem ipsum dolor sit amet lorem"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")

    val sql = spark.sql(
      """SELECT id,
        |  graft_char_hash(text) AS ch,
        |  graft_simhash(text) AS sh,
        |  graft_fold_hash(graft_fingerprint(text, 4, 2)) AS fpd,
        |  graft_fold_hash(graft_minhash_sig(graft_shingle_hashes(text, 2), 8, 42)) AS ms
        |FROM ext_docs""".stripMargin)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val api = df.select(col("id"),
        NativeExpressions.charHash(col("text"), 7L).as("ch"),
        NativeExpressions.simhash(col("text")).as("sh"),
        NativeExpressions.foldHash(
          NativeExpressions.fingerprint(col("text"), 4, 2), 7L).as("fpd"),
        NativeExpressions.foldHash(
          NativeExpressions.minhashSig(
            NativeExpressions.shingleHashes(col("text"), 2), 8, 42L), 7L).as("ms"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    assert(sql.toSeq == api.toSeq)
    assert(sql.map(_._2).distinct.length == 2) // non-vacuous: real hashes
  }

  test("graft_dot and graft_lsh_bucket work over array<float> in SQL") {
    Seq((1L, Seq(1.0f, 0.0f, 2.0f)), (2L, Seq(0.5f, 0.5f, 0.5f)))
      .toDF("id", "v").createOrReplaceTempView("ext_vecs")
    val r = spark.sql(
      """SELECT id, graft_dot(v, v) AS d,
        |  graft_lsh_bucket(v, 0, 4, 42, 3) AS b
        |FROM ext_vecs""".stripMargin)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(math.abs(r(0)._2 - 5.0) < 1e-12)
    assert(math.abs(r(1)._2 - 0.75) < 1e-12)
    assert(r.forall(x => x._3 >= 0 && x._3 < 16))
  }

  test("non-literal shape parameters fail analysis with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint('abc', id, 2) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
