package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Split
import graft.text.TextOps

/** The whole training-data story composed end-to-end on real corpus
  * data: quality filter → PII redaction → exact dedup → near-dup
  * clustering → canonicalize → stratified rebalance → three-way
  * split. Asserts the cross-operator invariants a pipeline relies on
  * (monotone shrinkage, no duplicates surviving their dedup stage,
  * splits partitioning the final set) — unit specs cannot see these.
  */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  test("documents flow through the full pipeline with consistent invariants") {
    val dir = "/root/testdata/sf0.01"
    val docs = Tables(spark, dir, "documents")
    val n0 = docs.count()

    // 1. quality filter + PII scrub
    val clean = docs.filter(TextOps.qualityKeep(col("text")))
      .withColumn("text", TextOps.piiRedact(col("text")))
    val n1 = clean.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: keep canonical docs only
    val exact = Dedup.exact(clean, "doc_id", "text")
    val exactKept = clean.join(
      exact.filter(!col("is_dup")).select("doc_id"), "doc_id")
    val n2 = exactKept.count()
    assert(n2 <= n1)
    // idempotence: exact dedup on its own output finds nothing
    assert(Dedup.exact(exactKept, "doc_id", "text")
      .filter(col("is_dup")).count() == 0L)

    // 3. near-dup clustering + canonicalize
    val pairs = Dedup.jaccardPairs(exactKept, "doc_id", "text", k = 3, tau = 0.8)
    val canonical = Dedup.canonicalize(exactKept, "doc_id",
      Dedup.clusters(pairs))
    val n3 = canonical.count()
    assert(n3 <= n2)
    // no near-dup pair can survive canonicalization
    assert(Dedup.jaccardPairs(canonical, "doc_id", "text", k = 3, tau = 0.8)
      .count() == 0L)

    // 4. stratified rebalance by language
    val balanced = Split.stratifiedBalance(canonical, "lang", "doc_id", seed = 7L)
    val perLang = balanced.groupBy("lang").count().as[(String, Long)]
      .collect().map(_._2)
    assert(perLang.nonEmpty && perLang.max <= 2 * perLang.min + 2,
      s"unbalanced: ${perLang.toSeq}")

    // 5. three-way split partitions the balanced set exactly
    val split = Split.assign3(balanced, "doc_id", 800, 100, seed = 42L)
    val bySplit = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == balanced.count())
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))

    // the pipeline actually dropped something at every lossy stage
    assert(n0 > n3, s"pipeline was a no-op: $n0 -> $n3")
  }
}
