package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("backward as-of: greatest right ts <= left ts, inclusive, null when none") {
    val purchases = Seq((1L, "p50", 50L), (1L, "p150", 150L), (1L, "p200", 200L),
        (2L, "lonely", 500L))
      .toDF("user_id", "purchase_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val clicks = Seq((1L, 100L), (1L, 200L), (3L, 1L))
      .toDF("user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val got = AsOf.backward(purchases, clicks, "user_id", "purchase_id", "ts")
      .select(col("purchase_id"), unix_micros(col("asof_ts")).as("a"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("p50").isEmpty)          // no click at or before 50
    assert(got("p150").contains(100L))  // latest click <= 150
    assert(got("p200").contains(200L))  // equal ts is inclusive
    assert(got("lonely").isEmpty)       // key with no right rows at all
  }
}
