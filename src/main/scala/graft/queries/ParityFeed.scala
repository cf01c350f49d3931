package graft.queries

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Bounded driver feed for the streaming batch↔stream parity queries.
  *
  * MemoryStream is driver-fed by construction, but the feed does NOT
  * have to materialize the whole input on the driver: `toLocalIterator`
  * streams one partition at a time, and fixed-size `addData` chunks
  * keep the transfer buffer O(chunk). All chunks are added BEFORE the
  * query starts, so the first trigger consumes every pre-added block
  * in ONE micro-batch — the watermark still only advances at the batch
  * boundary and no data event is ever late (chunking against a RUNNING
  * query would make each chunk its own micro-batch, advancing the
  * watermark between chunks and dropping earlier-timestamped data —
  * measurably wrong AND slower).
  *
  * Driver residency = MemoryStream's own block buffer (inherent to the
  * harness) + one in-flight chunk, instead of that buffer PLUS a full
  * `collect()` array.
  */
private[queries] object ParityFeed {

  val ChunkRows = 100000

  /** Runs `f` with `spark.sql.shuffle.partitions` lowered to `n` and
    * no-data micro-batches disabled, restoring both after. The parity
    * micro-batches carry sf-scale row counts through ONE stateful
    * operator; at the session default (32+) every micro-batch pays
    * per-partition state-store open/commit/checkpoint on mostly-empty
    * partitions — measurable fixed cost, no parallelism gain. Results
    * are partition-count independent (the hash gate runs these
    * queries at 32 and 256). No-data batches exist to fire event-time
    * timers WITHOUT new input; every parity query instead fires its
    * timers with explicit far-future sentinel rows, so the automatic
    * extra batch after each data batch is pure overhead (~0.6 s/query
    * measured, ProbeStream) and the final table is identical either
    * way — the timers fire in the sentinel's own data batch at the
    * latest. Safe because a streaming query fixes both settings from
    * the conf AT START, inside this scope; batch queries planned
    * after restore are untouched. */
  def withStreamParallelism[A](s: org.apache.spark.sql.SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ckKey = "spark.sql.streaming.checkpointLocation"
    val old = s.conf.get(key)
    val oldNd = s.conf.get(ndKey)
    val oldCk = s.conf.getOption(ckKey)
    // Checkpoint on tmpfs when available: the parity queries commit
    // offsets + state deltas for exactly 2-4 micro-batches and the
    // dirs are deleted right here, so disk durability buys nothing —
    // ~0.1 s/query of fsync/IO measured (ProbeStream /tmp vs
    // /dev/shm). Fresh UUID base per invocation ⇒ a rerun can never
    // resume a previous run's state.
    val ckDir: Option[java.nio.file.Path] =
      try {
        val base = java.nio.file.Paths.get("/dev/shm/graft_ckpt")
        java.nio.file.Files.createDirectories(base)
        Some(java.nio.file.Files.createTempDirectory(base, "p"))
      } catch { case _: Exception => None } // no tmpfs: keep Spark's temp dir
    s.conf.set(key, n.toString)
    s.conf.set(ndKey, "false")
    ckDir.foreach(d => s.conf.set(ckKey, d.toString))
    try f finally {
      s.conf.set(key, old)
      s.conf.set(ndKey, oldNd)
      oldCk match {
        case Some(v) => s.conf.set(ckKey, v)
        case None => if (ckDir.isDefined) s.conf.unset(ckKey)
      }
      ckDir.foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(d.toFile)
      }
    }
  }

  /** Streams `ds` into `input` in [[ChunkRows]]-sized blocks (call
    * before the query starts) and returns the max event-time micros
    * seen, for sentinel construction. Input must be non-empty. */
  def feed[T](input: MemoryStream[T], ds: Dataset[T], tsOf: T => Long): Long = {
    import scala.jdk.CollectionConverters._
    var maxTs = Long.MinValue
    // coalesce before the local iteration: toLocalIterator runs one
    // Spark job PER PARTITION, and the session default (32) makes the
    // feed pay ~32 job round-trips for sf-scale inputs — a measurable
    // slice of every parity query's ~2.3 s floor. Four partitions keep
    // driver residency at a quarter of the input (≤ ChunkRows-scale at
    // the gate's sf) while cutting the job count 8×.
    ds.coalesce(4).toLocalIterator().asScala.grouped(ChunkRows).foreach { chunk =>
      chunk.foreach { t => val ts = tsOf(t); if (ts > maxTs) maxTs = ts }
      input.addData(chunk)
    }
    require(maxTs != Long.MinValue, "parity feed: empty input")
    maxTs
  }

  /** [[feed]] with every chunk added TWICE — the exactly-once dedup
    * gate's duplicated feed as the same multiset `ds.union(ds)` would
    * produce, at HALF the driver iteration (one Spark-side scan and
    * one local pull instead of two). Order differs from the sequential
    * union (copies interleave per chunk), which the dedup gate's
    * operators are insensitive to: all pre-added blocks land in ONE
    * micro-batch, `dropDuplicatesWithinWatermark` keys on the id, and
    * the window counts are order-free. */
  def feedDoubled[T](input: MemoryStream[T], ds: Dataset[T], tsOf: T => Long): Long = {
    import scala.jdk.CollectionConverters._
    var maxTs = Long.MinValue
    ds.coalesce(4).toLocalIterator().asScala.grouped(ChunkRows).foreach { chunk =>
      chunk.foreach { t => val ts = tsOf(t); if (ts > maxTs) maxTs = ts }
      input.addData(chunk)
      input.addData(chunk)
    }
    require(maxTs != Long.MinValue, "parity feed: empty input")
    maxTs
  }
}
