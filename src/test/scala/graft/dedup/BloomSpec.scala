package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.NativeExpressions

/** Bloom membership: no false negatives, deterministic probe results
  * under repartitioning, sane false-positive behavior at the default
  * sizing, and word-table compactness.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def key = NativeExpressions.charHash(col("text"), 7L)

  private val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"))
    .cache()

  test("no false negatives: every build-set doc probes true") {
    val ref = docs.where(col("lang") === "en")
    val words = Bloom.build(ref, key)
    val probed = Bloom.probe(docs, "doc_id", key, words)
      .as[(Long, Boolean)].collect().toMap
    val refIds = ref.select("doc_id").as[Long].collect()
    assert(refIds.nonEmpty)
    assert(refIds.forall(probed(_)), "a member hashed to an unset bit")
  }

  test("false positives exist as flags only on non-members and are rare") {
    val ref = docs.where(col("lang") === "en")
    val words = Bloom.build(ref, key)
    val probed = Bloom.probe(docs, "doc_id", key, words)
      .as[(Long, Boolean)].collect().toMap
    val nonMembers = docs.where(col("lang") =!= "en")
      .select("doc_id").as[Long].collect()
    val fp = nonMembers.count(probed(_))
    // 218 keys * 4 hashes in 65536 bits -> fill ~1.3%, fp ~ (0.013)^4
    assert(fp.toDouble / nonMembers.length < 0.05,
      s"$fp false positives of ${nonMembers.length}")
  }

  test("probe is partitioning-independent (1 vs 16 partitions)") {
    val ref = docs.where(col("lang") === "en")
    val a = Bloom.probe(docs.repartition(1), "doc_id", key,
        Bloom.build(ref.repartition(1), key))
      .as[(Long, Boolean)].collect().sorted.toSeq
    val b = Bloom.probe(docs.repartition(16), "doc_id", key,
        Bloom.build(ref.repartition(16), key))
      .as[(Long, Boolean)].collect().sorted.toSeq
    assert(a == b)
  }

  test("word table is bounded by mBits/32 and bits stay in 32-bit range") {
    val words = Bloom.build(docs, key, kHashes = 4, mBits = 1024)
      .as[(Long, Long)].collect()
    assert(words.length <= 1024 / 32)
    assert(words.forall { case (w, bits) =>
      w >= 0 && w < 32 && bits > 0 && bits <= 0xFFFFFFFFL
    })
  }

  test("smaller filter saturates: fp rate rises but never a false negative") {
    val ref = docs.where(col("lang") === "en")
    val words = Bloom.build(ref, key, mBits = 512)
    val probed = Bloom.probe(docs, "doc_id", key, words, mBits = 512)
      .as[(Long, Boolean)].collect().toMap
    val refIds = ref.select("doc_id").as[Long].collect()
    assert(refIds.forall(probed(_)))
  }
}
