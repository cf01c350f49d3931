package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental DFG maintenance: fold an append-only batch of new
  * events into an existing directly-follows graph WITHOUT rescanning
  * history — the daily-increment shape that matters at 100 TB, where
  * "recompute the DFG" means re-reading the whole corpus but
  * "maintain it" means one pass over the day's slice.
  *
  * Contract: batches are append-only per case — every event in the
  * new batch is later (by (ts, tieBreak)) than every already-folded
  * event of the same case. That is the standard shape of time-
  * partitioned ingestion; [[update]] then needs exactly two pieces of
  * state, both tiny relative to the log:
  *
  *  - `edges`: the running (act_from, act_to, n) counts
  *    (alphabet²-bounded);
  *  - `frontier`: the LAST event per case seen so far (one row per
  *    open case) — the only history the next batch can pair with.
  *
  * The new batch contributes its internal directly-follows pairs plus
  * one boundary pair per case that already had events (frontier's
  * last activity → batch's first activity). Equivalence with the
  * monolithic recompute is exact and is property-tested against
  * random splits (IncrementalDfgSpec).
  *
  * Scale shape: one case-key window pass over the BATCH (not the
  * log), a co-partitioned frontier join on the case key, and an
  * alphabet-sized edge merge. Frontier size = number of cases, edges
  * size = alphabet² — both orders of magnitude below the event mass.
  */
object IncrementalDfg {

  /** Running state as two DataFrames. `edges`: (act_from, act_to, n);
    * `frontier`: (caseCol, _lastAct, _lastTs, _lastTie). */
  case class State(edges: DataFrame, frontier: DataFrame)

  /** Empty state matching a given batch's schema conventions. */
  def init(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String): State = {
    val spark = events.sparkSession
    import org.apache.spark.sql.types._
    val caseField = events.schema(caseCol)
    val actField = events.schema(activityCol)
    val tsField = events.schema(tsCol)
    val tieField = events.schema(tieBreak)
    State(
      edges = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("act_from", actField.dataType),
          StructField("act_to", actField.dataType),
          StructField("n", LongType)))),
      frontier = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(caseCol, caseField.dataType),
          StructField("_lastAct", actField.dataType),
          StructField("_lastTs", tsField.dataType),
          StructField("_lastTie", tieField.dataType)))))
  }

  /** Fold one append-only batch into the state. */
  def update(state: State, batch: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String): State = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieBreak))
    val wDesc = Window.partitionBy(col(caseCol))
      .orderBy(col(tsCol).desc, col(tieBreak).desc)

    val inner = Dfg.edges(batch, caseCol, activityCol, tsCol, tieBreak)

    val firsts = batch
      .select(col(caseCol), col(activityCol), col(tsCol), col(tieBreak))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col(caseCol), col(activityCol).as("_firstAct"))
    val boundary = firsts
      .join(state.frontier, Seq(caseCol)) // inner: only cases with history
      .groupBy(col("_lastAct").as("act_from"),
        col("_firstAct").as("act_to"))
      .agg(count(lit(1)).as("n"))

    val edges = state.edges.unionByName(inner).unionByName(boundary)
      .groupBy("act_from", "act_to").agg(sum("n").as("n"))

    val lasts = batch
      .select(col(caseCol), col(activityCol), col(tsCol), col(tieBreak))
      .withColumn("_rn", row_number().over(wDesc)).filter(col("_rn") === 1)
      .select(col(caseCol), col(activityCol).as("_lastAct"),
        col(tsCol).as("_lastTs"), col(tieBreak).as("_lastTie"))
    // Batch wins wherever it has events (append-only ⇒ later);
    // untouched cases keep their old frontier row.
    val keptOld = state.frontier.join(lasts.select(col(caseCol)),
      Seq(caseCol), "left_anti")
    val frontier = keptOld.unionByName(lasts)

    State(edges, frontier)
  }
}
