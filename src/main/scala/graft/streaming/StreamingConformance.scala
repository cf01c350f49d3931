package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.ops.{Alignments, Alpha, PetriNet, Replay}

/** Streaming conformance checking: fitness per CLOSED trace against a
  * broadcast reference model — the online "check" half next to
  * [[StreamingDfg]]'s online "discover". Both batch checkers lift
  * directly because closed traces arrive whole and ordered
  * ([[TraceAssembly]] resolves out-of-order arrival at session
  * close), so each trace is scored exactly once, map-side, with no
  * additional state.
  *
  * State bound = TraceAssembly's open-session bound; the replay /
  * alignment itself is stateless per emitted trace. At 100 TB-rates
  * the alignment variant bounds its search per trace (alphabet-sized
  * safe nets ⇒ tiny product spaces); a deviating-trace alarm is a
  * `filter(fitness < θ)` on the result stream.
  */
object StreamingConformance {

  case class TraceFitness(caseId: String, nEvents: Long,
      fitness: Double, missing: Long, remaining: Long)

  case class TraceAlignment(caseId: String, nEvents: Long,
      cost: Int, fitness: Double)

  /** Token-replay fitness per closed trace against a workflow net. */
  def replayFitness(spark: SparkSession,
      events: Dataset[TraceAssembly.InEvent], gapSeconds: Long,
      net: Alpha.WorkflowNet): Dataset[TraceFitness] = {
    import spark.implicits._
    val bNet = spark.sparkContext.broadcast(net)
    TraceAssembly.assemble(spark, events, gapSeconds).map { t =>
      val vf = Replay.replayVariant(bNet.value, t.activities)
      TraceFitness(t.caseId, t.nEvents, vf.fitness, vf.missing, vf.remaining)
    }
  }

  /** Optimal-alignment fitness per closed trace against a Petri net
    * (τ-aware, so discovered process-tree models work unchanged). */
  def alignmentFitness(spark: SparkSession,
      events: Dataset[TraceAssembly.InEvent], gapSeconds: Long,
      net: PetriNet): Dataset[TraceAlignment] = {
    import spark.implicits._
    val bNet = spark.sparkContext.broadcast(net)
    val emptyCost = Alignments.shortestModelRunCost(net)
    TraceAssembly.assemble(spark, events, gapSeconds).map { t =>
      val a = Alignments.align(bNet.value, t.activities.toIndexedSeq)
      val worst = t.activities.length + emptyCost
      val fit = if (worst == 0) 1.0 else 1.0 - a.cost.toDouble / worst
      TraceAlignment(t.caseId, t.nEvents, a.cost, fit)
    }
  }
}
