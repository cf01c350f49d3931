package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.PageRank

/** Scratch dev probe for PageRank plan/runtime experiments. */
object ProbePr {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("32")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val edges = PageRank.coTransactionEdges(spark, dir)
    println(s"[probe] edges=${edges.count()}  nodes=${edges.select("src").distinct().count()}")

    // end-to-end topK timing, repeated (first run = planning+codegen)
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      PageRank.topK(spark, edges, 3, 50).count()
      println(f"[probe] topK run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
