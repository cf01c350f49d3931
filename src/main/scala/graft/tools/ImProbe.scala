package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.{InductiveLog, PetriNet}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase-split timing probe for `q_inductive_log_fitness`: mining
  * (the level-synchronous recursion) vs per-variant net acceptance,
  * for targeted re-spots against a chosen sf dir (`args(0)`). */
object ImProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ev = Tables(spark, dir, "events")
    var t0 = System.nanoTime()
    val tree = InductiveLog.mine(ev, "user_id", "event_type", "ts", "event_id")
    println(s"MINE ${(System.nanoTime() - t0) / 1e9}s tree=${tree.render.take(200)}")
    t0 = System.nanoTime()
    val bNet = spark.sparkContext.broadcast(PetriNet.fromTree(tree))
    import spark.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val n = ev.select(col("user_id"),
        collect_list(col("event_type")).over(w).as("_seq"))
      .groupBy(col("user_id")).agg(first(col("_seq")).as("_seq"))
      .groupBy(col("_seq")).agg(count(lit(1)).as("_n"))
      .as[(Seq[String], Long)]
      .map { case (v, c) => (v.mkString(","), c, bNet.value.accepts(v.toIndexedSeq)) }
      .toDF("variant", "n_cases", "accepted").count()
    println(s"ACCEPT ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    spark.stop()
  }
}
