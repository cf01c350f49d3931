package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import graft.functions.Portable

/** Scratch stage-profiler for the dedup pipelines (dev tool). */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")

    val sh = docs.select(col("doc_id").as("_id"),
      Dedup.shingleHashes(col("text"), 3).as("_sh"))
      .filter(size(col("_sh")) > 0)
    t("shingleHashes count")(sh.count())
    sh.cache(); sh.count()

    val sig = sh.withColumn("_sig", Dedup.minhashSignature(col("_sh"), 32, 42L))
    t("signatures")(sig.select(col("_id"), col("_sig")).count())

    val banded = sig.select(col("_id"),
      posexplode(array((0 until 8).map(b => Dedup.bandHash(col("_sig"), b, 4)): _*))
        .as(Seq("_band", "_bh")))
    t("banded")(banded.count())

    val cand = banded.select(col("_id").as("id_a"), col("_band"), col("_bh"))
      .join(banded.select(col("_id").as("id_b"), col("_band"), col("_bh")),
        Seq("_band", "_bh"))
      .filter(col("id_a") < col("id_b"))
    t("candidate band pairs")(println("pairs=" + cand.count()))

    val uniq = cand.select("id_a", "id_b").distinct()
    t("distinct pairs")(println("uniq=" + uniq.count()))

    val withSh = uniq
      .join(sh.select(col("_id").as("id_a"), col("_sh").as("_sha")), "id_a")
      .join(sh.select(col("_id").as("id_b"), col("_sh").as("_shb")), "id_b")
      .withColumn("_inter", size(array_intersect(col("_sha"), col("_shb"))))
      .withColumn("jaccard", col("_inter").cast("double") /
        (size(col("_sha")) + size(col("_shb")) - col("_inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
    t("verify")(println("verified=" + withSh.count()))
    spark.stop()
  }
}
