package graft.ops

import org.apache.spark.sql.DataFrame

/** Deterministic release of `localCheckpoint` storage (r17, guide §5
  * memory hygiene): `Dataset.unpersist` only clears CacheManager
  * entries, so the blocks behind a checkpointed frame otherwise live
  * until the ContextCleaner GC-collects the RDD — under a bench run
  * that is long enough for stale generations of an iterative
  * operator's edge lists to stack up and pressure the executor store.
  * Walks the logical plan for the `LogicalRDD` leaves a checkpoint
  * compiles to and unpersists their RDDs directly. Call ONLY on
  * frames no downstream plan will read again. */
object LocalCkpt {
  def free(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
