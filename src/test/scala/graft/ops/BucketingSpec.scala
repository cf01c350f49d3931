package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Co-located join via bucketing: both fact tables bucketed on the
  * join key ⇒ the join plans with ZERO shuffle exchanges, and a
  * bucket-key aggregation needs no exchange either. This is the
  * at-scale contract for the dominant fact-to-fact join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join and bucket-key agg are exchange-free") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // DROP in a later session leaves the location dir behind — clear it
    Seq("li_b", "ord_b").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    Bucketing.writeBucketed(Tables(spark, dir, "lineitem"), "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables(spark, dir, "orders"), "ord_b", "o_orderkey", 8)

    val li = spark.table("li_b")
    val ord = spark.table("ord_b")

    // Plain parquet join shuffles both sides…
    val unbucketed = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.isExchangeFree(unbucketed))

    // …the bucketed join does not.
    val joined = li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    assert(Bucketing.isExchangeFree(joined))
    assert(joined.count() > 0)

    // bucket-key aggregation: no exchange before the final agg
    val agg = li.groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(Bucketing.isExchangeFree(agg))
    assert(agg.count() > 0)
  }
}
