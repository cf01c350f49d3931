package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The four-dimension model-quality report (fitness / precision /
  * generalization / simplicity — the standard conformance framework
  * from the process-mining literature) in one call, composing the
  * engine's checkers:
  *
  *  - fitness: case-weighted token replay ([[Replay]]);
  *  - precision: escaping edges ([[Precision]]);
  *  - generalization: frequency-based — `1 − Σ_t w_t ·
  *    (√exec(t))⁻¹ / Σ_t w_t` over labeled activities, where exec(t)
  *    counts the activity's events; rarely-exercised parts of the
  *    model suggest overfitting to sparse evidence;
  *  - simplicity: inverse arc/node density of the net,
  *    `(|T| + |P|) / |F|` capped at 1 — the structural parsimony
  *    proxy (an activity-per-node net scores high; spaghetti scores
  *    low).
  *
  * Each dimension is computed on its natural representation: the
  * event mass distributes (variant tables, one case shuffle); the
  * model-sized parts (net structure) stay on the driver.
  */
object Quality {

  case class Report(fitness: Double, precision: Double,
      generalization: Double, simplicity: Double)

  def report(spark: SparkSession, events: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String,
      wfNet: Alpha.WorkflowNet): Report = {
    val net = PetriNet.fromWorkflowNet(wfNet)

    val fitness = Replay.logFitness(
      Replay.variantFitness(spark, events, caseCol, activityCol, tsCol,
        tieBreak, wfNet))

    val precision = Precision.precision(
      Precision.prefixTable(spark, events, caseCol, activityCol, tsCol,
        tieBreak, net))

    // frequency-based generalization over activity execution counts
    import org.apache.spark.sql.functions._
    val execs = events.groupBy(col(activityCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val labeled = net.transitions.flatMap(_.label).distinct
    val gen =
      if (labeled.isEmpty) 1.0
      else 1.0 - labeled.map(a =>
        1.0 / math.sqrt(execs.getOrElse(a, 0L).max(1L).toDouble)).sum /
        labeled.size.toDouble

    val arcs = net.arcs.size.max(1)
    val simplicity =
      math.min(1.0, (net.transitions.size + net.places.size).toDouble / arcs)

    Report(fitness, precision, gen, simplicity)
  }
}
