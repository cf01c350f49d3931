package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Streaming directly-follows mining: edges emitted from CLOSED
  * traces ([[TraceAssembly]]), so ordering is resolved once per trace
  * at session close — exact under out-of-order arrival within the
  * watermark, unlike last-event-state streaming DFGs that corrupt
  * edges on any reordering. Downstream the edge stream feeds an
  * ordinary streaming aggregation (or lands in parquet for the batch
  * [[graft.ops.Dfg]] analytics).
  *
  * State = open traces only (TraceAssembly's bound); edge emission is
  * stateless flatMap over each closed trace.
  */
object StreamingDfg {

  case class Edge(actFrom: String, actTo: String)

  def edges(spark: SparkSession, events: Dataset[TraceAssembly.InEvent],
      gapSeconds: Long): Dataset[Edge] = {
    import spark.implicits._
    TraceAssembly.assemble(spark, events, gapSeconds).flatMap { t =>
      t.activities.sliding(2).collect { case Seq(a, b) => Edge(a, b) }
    }
  }
}
