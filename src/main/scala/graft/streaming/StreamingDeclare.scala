package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Streaming DECLARE monitoring: evaluate a fixed set of declarative
  * constraints against every CLOSED trace — the online companion of
  * [[graft.ops.Declare]] (discovery mines constraints from history;
  * this monitors a live stream against them). Same closed-trace shape
  * as [[StreamingConformance]]: [[TraceAssembly]] owns all state, the
  * per-trace evaluation is stateless map-side work over the broadcast
  * constraint list, so the memory bound is unchanged (open sessions
  * only) at any stream rate.
  *
  * Evaluation uses the same per-trace profile algebra as the batch
  * miner (first/last position and count per activity); the spec
  * cross-checks the two implementations on identical logs.
  */
object StreamingDeclare {

  /** One constraint to monitor; `actB` is ignored for the unary
    * templates (`existence`, `absence2`, `init`, `last`). */
  case class Constraint(template: String, actA: String, actB: String = "")

  case class TraceCheck(caseId: String, template: String, actA: String,
      actB: String, applicable: Boolean, satisfied: Boolean)

  /** Pure per-trace evaluator (shared semantics with the batch
    * miner's profile algebra): returns (applicable, satisfied). A
    * constraint that is not applicable to the trace is reported
    * satisfied=true (vacuous), applicable=false.
    */
  def evaluate(c: Constraint, activities: Seq[String]): (Boolean, Boolean) = {
    val first = scala.collection.mutable.Map.empty[String, Int]
    val last = scala.collection.mutable.Map.empty[String, Int]
    val count = scala.collection.mutable.Map.empty[String, Int]
    var i = 0
    activities.foreach { a =>
      i += 1
      if (!first.contains(a)) first(a) = i
      last(a) = i
      count(a) = count.getOrElse(a, 0) + 1
    }
    val n = activities.length
    val hasA = count.contains(c.actA)
    val hasB = count.contains(c.actB)
    c.template match {
      case "existence" => (true, hasA)
      case "absence2" => (true, count.getOrElse(c.actA, 0) <= 1)
      case "init" => (true, n > 0 && first.get(c.actA).contains(1))
      case "last" => (true, n > 0 && last.get(c.actA).contains(n))
      case "responded_existence" => (hasA, !hasA || hasB)
      case "response" =>
        (hasA, !hasA || (hasB && last(c.actB) > last(c.actA)))
      case "precedence" =>
        (hasB, !hasB || (hasA && first(c.actA) < first(c.actB)))
      case "succession" =>
        val resp = !hasA || (hasB && last(c.actB) > last(c.actA))
        val prec = !hasB || (hasA && first(c.actA) < first(c.actB))
        (hasA || hasB, resp && prec)
      case other =>
        throw new IllegalArgumentException(s"unknown template: $other")
    }
  }

  /** One check row per (closed trace × constraint). Violations are
    * `filter(applicable && !satisfied)` on the result stream. */
  def monitor(spark: SparkSession, events: Dataset[TraceAssembly.InEvent],
      gapSeconds: Long, constraints: Seq[Constraint]): Dataset[TraceCheck] = {
    import spark.implicits._
    val bCons = spark.sparkContext.broadcast(constraints)
    TraceAssembly.assemble(spark, events, gapSeconds).flatMap { t =>
      bCons.value.map { c =>
        val (app, sat) = evaluate(c, t.activities)
        TraceCheck(t.caseId, c.template, c.actA, c.actB, app, sat)
      }
    }
  }
}
