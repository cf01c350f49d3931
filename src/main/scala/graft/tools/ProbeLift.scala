package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.text.TextOps

/** Scratch profiler for q_token_lift's stages (dev tool). */
object ProbeLift {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("32")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).repartition(col("doc_id"))
    t("count")(docs.count())
    t("tokens explode")(docs.select(explode(TextOps.tokens(col("text"))).as("t")).count())
    t("uni groupBy")(docs.select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().count())
    t("shingles explode")(docs.select(explode(TextOps.shingles(col("text"), 2)).as("g")).count())
    t("bi groupBy")(docs.select(explode(TextOps.shingles(col("text"), 2)).as("g"))
      .groupBy("g").count().count())
    spark.stop()
  }
}
