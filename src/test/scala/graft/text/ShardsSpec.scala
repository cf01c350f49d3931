package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Shard export: deterministic assignment, loss-free partitioned
  * write, manifest consistency. */
class ShardsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("assignment is deterministic and in range") {
    val docs = Tables(spark, sf, "documents")
    val a1 = Shards.assign(docs, "doc_id", 16, 42L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    val a2 = Shards.assign(docs, "doc_id", 16, 42L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(a1.sortBy(_._1).sameElements(a2.sortBy(_._1)))
    assert(a1.forall { case (_, s) => s >= 0 && s < 16 })
    // a different seed produces a genuinely different assignment
    val b = Shards.assign(docs, "doc_id", 16, 7L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(!a1.sortBy(_._1).sameElements(b.sortBy(_._1)))
  }

  test("manifest totals equal corpus totals; write round-trips losslessly") {
    val docs = Tables(spark, sf, "documents")
    val m = Shards.manifest(docs, "doc_id", col("n_chars"), 16, 42L)
    val tot = m.agg(sum("n_docs"), sum("n_units")).collect()(0)
    assert(tot.getLong(0) == docs.count())
    assert(tot.getLong(1) ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))

    val out = Files.createTempDirectory("graft_shards").toString
    Shards.write(docs, "doc_id", 16, 42L, out)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // partition layout: one directory per realized shard
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard="))
    assert(dirs.nonEmpty && dirs.length <= 16)
    // round trip preserves every doc with its shard assignment
    val expected = Shards.assign(docs, "doc_id", 16, 42L)
      .select(col("doc_id"), col("shard"))
    val got = back.select(col("doc_id"), col("shard").cast("int").as("shard"))
    assert(got.exceptAll(expected).count() == 0L)
    assert(expected.exceptAll(got).count() == 0L)
  }

  test("trainingOrder is a dense per-shard permutation, independent of input partitioning") {
    val docs = graft.Tables(spark, sf, "documents")
    val ord = Shards.trainingOrder(docs, "doc_id", nShards = 16, seed = 42L)
      .select("doc_id", "shard", "pos").cache()
    try {
      val n = docs.count()
      assert(ord.count() == n) // every doc exactly once
      // (shard, pos) is unique and pos is dense 0..count-1 per shard
      assert(ord.select("shard", "pos").distinct().count() == n)
      val dense = ord.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
        .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1L)
      assert(dense.count() == 0L)
      // deterministic under re-partitioning of the input
      val re = Shards.trainingOrder(docs.repartition(7), "doc_id", 16, 42L)
        .select("doc_id", "shard", "pos")
      assert(re.exceptAll(ord).count() == 0L)
      assert(ord.exceptAll(re).count() == 0L)
      // the order is not the identity (it actually shuffles): the
      // first 10 positions of shard 0 are not the 10 smallest doc_ids
      val first = ord.filter(col("shard") === 0 && col("pos") < 10)
        .agg(max("doc_id")).head().getLong(0)
      val smallest = ord.filter(col("shard") === 0)
        .agg(min("doc_id")).head().getLong(0)
      assert(first > smallest + 10)
    } finally ord.unpersist()
  }
}
