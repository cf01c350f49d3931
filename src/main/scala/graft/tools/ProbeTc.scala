package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.{Sessionize, TraceCluster}

/** Throwaway stage-timing probe for q_trace_clusters. */
object ProbeTc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("32")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val sess = Sessionize.byGap(Tables(spark, dir, "events"),
        "user_id", "ts", "event_id", 43200L)
      .withColumn("session_key", col("user_id") * 100000L + col("session_idx"))
    time("byGap+variants") {
      Sessionize.variantRepresentatives(sess, "session_key", "event_type",
        "ts", "event_id").count()
    }
    val reps = Sessionize.variantRepresentatives(sess, "session_key",
      "event_type", "ts", "event_id").cache()
    time("reps materialize")(reps.count())
    time("probe volume") {
      import org.apache.spark.sql.functions.{col, length}
      val n = reps.count()
      val nLong = reps.filter(length(col("variant")) > 5).count()
      println(s"[probe] n_variants=$n n_long=$nLong")
    }
    // fine-grained decomposition via package-private stages
    time("stage: candidates") {
      println(s"[probe] n_cands=${TraceCluster.debugCandidates(reps, 5).count()}")
    }
    time("stage: candidates.distinct") {
      println(s"[probe] n_distinct=${TraceCluster.debugCandidates(reps, 5).distinct().count()}")
    }
    val pairs = time("editPairs") {
      val p = TraceCluster.editPairs(reps, 5).cache()
      println(s"[probe] n_pairs=${p.count()}")
      p
    }
    time("clusters") {
      graft.dedup.Dedup.clusters(pairs, "vid_a", "vid_b").count()
    }
    time("full query") {
      graft.SparkEntry.queries("q_trace_clusters")(spark, dir).count()
    }
    spark.stop()
  }
}
