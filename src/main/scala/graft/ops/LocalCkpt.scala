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

  /** r18 (advisor item): `free` unpersists every LogicalRDD leaf in
    * the plan it is handed, and a freed checkpoint has TRUNCATED
    * lineage — reaching a leaf shared with a live frame would fail
    * that frame unrecoverably. Require the argument to be the
    * checkpoint itself (at most one LogicalRDD leaf; zero for the
    * not-yet-checkpointed first generation of an iterative loop), so
    * the composite-plan footgun is a loud error instead of a scaladoc
    * sentence. */
  def free(df: DataFrame): Unit = {
    val leaves = df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    require(leaves.size <= 1,
      s"LocalCkpt.free expects the checkpointed frame itself (at most one " +
        s"LogicalRDD leaf), got ${leaves.size} — freeing leaves reachable " +
        "from a composite plan could unpersist blocks shared with live frames")
    leaves.foreach(_.unpersist(blocking = false))
  }

  /** Row-count cutoff for materializing a reused intermediate
    * (`SPARK_GRAFT_CKPT_MAX_ROWS`, default 2^25 ≈ 33.5M rows), parsed
    * once and validated loudly (advisor pattern). The r17 rule:
    * checkpoint a fan-out intermediate ONLY when it is orders of
    * magnitude smaller than its input — an O(input)-row checkpoint
    * pins a corpus-sized frame in non-replicated executor storage and,
    * because localCheckpoint truncates lineage, makes the query
    * unrecoverable on executor loss. Above the cutoff callers keep
    * the lazy plan: consumers re-scan with column pruning instead. */
  val maxRows: Long = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_CKPT_MAX_ROWS", (1L << 25).toString)
    try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"SPARK_GRAFT_CKPT_MAX_ROWS must be a long, got '$raw'")
    }
  }

  /** `df.localCheckpoint(eager = true)` when `rows` (a count the
    * caller already has, typically of the base table feeding `df`) is
    * within [[maxRows]]; the unmodified lazy `df` otherwise. */
  def ifSmall(df: DataFrame, rows: Long): DataFrame =
    if (rows <= maxRows) df.localCheckpoint(true) else df
}
