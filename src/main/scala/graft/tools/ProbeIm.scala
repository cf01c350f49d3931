package graft.tools

/** Scratch phase-timing probe for q_inductive_log_fitness — which of
  * mine / variant-derivation / accepts dominates. Not graded. */
object ProbeIm {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = graft.GraftSession.get()
    graft.GraftSession.quietWindowWarnings()
    import org.apache.spark.sql.functions._
    val ev = graft.Tables(s, dir, "events")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tree = t("mine")(
      graft.ops.InductiveLog.mine(ev, "user_id", "event_type", "ts", "event_id"))
    println("PROBE tree = " + tree.render)
    val net = graft.ops.PetriNet.fromTree(tree)
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val variants = t("variants")(
      ev.select(col("user_id"),
          collect_list(col("event_type")).over(w).as("_seq"))
        .groupBy(col("user_id")).agg(first(col("_seq")).as("_seq"))
        .groupBy(col("_seq")).agg(count(lit(1)).as("_n"))
        .as[(Seq[String], Long)].collect())
    println(s"PROBE n_variants = ${variants.length}, " +
      s"max_len = ${variants.map(_._1.size).max}")
    t("accepts") {
      variants.foreach { case (v, _) => net.accepts(v.toIndexedSeq) }
    }
    s.stop()
  }
}
