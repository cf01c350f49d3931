package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heuristics-miner causal-net construction (Weijters' Heuristics
  * Miner), built on the dependency measures of [[Dfg]] — the model-
  * construction step the reference's aspirational discovery surface
  * (`/root/reference/src/lib.rs:11-22`) pairs with the DFG.
  *
  * An edge (a,b) of the causal net is kept when any of:
  *  - `dep`:  dependency(a,b) ≥ `depThreshold` and frequency ≥ `minEdgeN`
  *            (covers self-loops via dep(a,a) = n/(n+1));
  *  - `l2`:   the length-2-loop measure l2(a,b) =
  *            (|aba| + |bab|) / (|aba| + |bab| + 1) ≥ `depThreshold`
  *            (a ≠ b — recovers short loops the plain dependency
  *            measure suppresses);
  *  - `best`: b is a's strongest successor or a is b's strongest
  *            predecessor (the "all-tasks-connected" heuristic, so no
  *            observed activity dangles regardless of thresholds).
  *            Ties break on activity name for determinism.
  *
  * `reason` reports the highest-priority rule that fired
  * (dep &gt; l2 &gt; best).
  *
  * Scale shape: both measure passes are single case-key window
  * shuffles over the event stream ([[Dfg.edges]] + a lead(2) scan);
  * everything after operates on the alphabet-sized edge list
  * (broadcast joins, window ranks over |A|² rows at most).
  */
object Heuristics {

  /** Length-2-loop counts: for each ordered pair a ≠ b, the number of
    * `a b a` windows within a case (overlaps counted, the standard
    * definition).
    */
  def l2Counts(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieBreak))
    events
      .select(col(caseCol), col(activityCol), col(tsCol), col(tieBreak))
      .withColumn("_n1", lead(col(activityCol), 1).over(w))
      .withColumn("_n2", lead(col(activityCol), 2).over(w))
      .filter(col("_n2") === col(activityCol) &&
        col("_n1") =!= col(activityCol))
      .groupBy(col(activityCol).as("act_from"), col("_n1").as("act_to"))
      .agg(count(lit(1)).as("n_aba"))
  }

  /** The kept causal-net edge list:
    * `(act_from, act_to, n, dependency, reason)`.
    */
  def net(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, depThreshold: Double,
      minEdgeN: Long): DataFrame = {
    // Materialize the two alphabet-bounded measure tables ONCE (r17):
    // `dep` fans into both best-successor rankings and the final join
    // (3 references), `l2` into both sides of its symmetrizing union —
    // uncached, every reference re-ran the case-window pass over the
    // full event log (18 scans / 56 Exchanges in the r17 plan audit).
    // Both tables are ≤|A|² rows, so the checkpoints are trivially
    // cheap at any scale.
    val dep = Dfg.dependencyMeasures(events, caseCol, activityCol,
      tsCol, tieBreak).localCheckpoint(true)
    val n = Dfg.edges(events, caseCol, activityCol, tsCol, tieBreak)
    val l2 = l2Counts(events, caseCol, activityCol, tsCol, tieBreak)
      .localCheckpoint(true)
    val l2sym = l2.unionByName(
        l2.select(col("act_to").as("act_from"), col("act_from").as("act_to"),
          col("n_aba")))
      .groupBy("act_from", "act_to").agg(sum("n_aba").as("_l2n"))
      .withColumn("l2dep",
        col("_l2n").cast("double") / (col("_l2n") + 1).cast("double"))

    // Self-loops sit outside the best-of ranking (standard HM rule):
    // rank only a ≠ b edges, then mark rank-1 rows.
    val wBestOut = Window.partitionBy(col("act_from"))
      .orderBy(col("dependency").desc, col("act_to"))
    val wBestIn = Window.partitionBy(col("act_to"))
      .orderBy(col("dependency").desc, col("act_from"))
    val nonSelf = dep.filter(col("act_from") =!= col("act_to"))
    val bestOut = nonSelf.withColumn("_r", row_number().over(wBestOut))
      .filter(col("_r") === 1)
      .select(col("act_from"), col("act_to"), lit(true).as("_bestOut"))
    val bestIn = nonSelf.withColumn("_r", row_number().over(wBestIn))
      .filter(col("_r") === 1)
      .select(col("act_from"), col("act_to"), lit(true).as("_bestIn"))

    dep.join(n, Seq("act_from", "act_to"))
      .join(broadcast(l2sym.select("act_from", "act_to", "l2dep")),
        Seq("act_from", "act_to"), "left")
      .join(broadcast(bestOut), Seq("act_from", "act_to"), "left")
      .join(broadcast(bestIn), Seq("act_from", "act_to"), "left")
      .withColumn("reason",
        when(col("dependency") >= depThreshold && col("n") >= minEdgeN,
          lit("dep"))
        .when(col("l2dep") >= depThreshold, lit("l2"))
        .when(col("_bestOut") || col("_bestIn"), lit("best")))
      .filter(col("reason").isNotNull)
      .select("act_from", "act_to", "n", "dependency", "reason")
  }
}
