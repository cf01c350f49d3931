package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Native

/** Streaming near-duplicate DETECTION: the MinHash+LSH candidate
  * generator as keyed streaming state. Each arriving document is
  * sketched map-side (same native kernels as the batch path:
  * shingles → signature → band buckets) and each (band, bucket) key
  * remembers the FIRST document that claimed it; later documents
  * hitting a claimed bucket emit a collision record against that
  * canonical holder. Downstream decides policy (drop on any
  * collision ≈ batch LSH candidates; verify exactly like the batch
  * pipeline if precision matters).
  *
  * State = one (docId, eventTime) per live bucket, expired by the
  * processing-time timeout tied to the watermark budget — bounded by
  * distinct buckets in the horizon, independent of stream length.
  */
object StreamingNearDup {

  case class Doc(docId: Long, text: String, tsMicros: Long)

  case class BucketHit(band: Int, bucket: Long, docId: Long, tsMicros: Long)

  case class Collision(docId: Long, firstDocId: Long, band: Int, bucket: Long)

  /** Public state class (state-store codegen needs reflective access). */
  case class Holder(docId: Long, tsMicros: Long)

  /** Map-side sketch: one BucketHit per (doc, band). */
  def bucketHits(spark: SparkSession, docs: Dataset[Doc], k: Int,
      numHashes: Int, bands: Int, seed: Long): Dataset[BucketHit] = {
    import spark.implicits._
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val r = numHashes / bands
    docs.flatMap { d =>
      val sh = Native.shingleHashes(UTF8String.fromString(d.text), k)
      if (sh.numElements() == 0) Iterator.empty
      else {
        val sig = Native.minhashSig(sh, numHashes, seed)
        (0 until bands).iterator.map { b =>
          var acc = 0L
          (0 until r).foreach { j =>
            acc = (acc * 1009L + sig.getLong(b * r + j)) % graft.functions.Portable.P
          }
          BucketHit(b, acc, d.docId, d.tsMicros)
        }
      }
    }
  }

  /** Collision stream: for every bucket hit on a bucket already held
    * by an earlier (first-seen) document, a Collision row. `hits`
    * must carry an event-time watermark (apply it on the source
    * before sketching, as with [[TraceAssembly]]); a bucket claim
    * expires `ttlSeconds` of EVENT time after its last hit —
    * event-time timeouts, so state retires with the watermark instead
    * of busy-polling processing time. */
  def collisions(spark: SparkSession, hits: Dataset[BucketHit],
      ttlSeconds: Long): Dataset[Collision] = {
    import spark.implicits._
    def update(key: (Int, Long), in: Iterator[BucketHit],
        state: GroupState[Holder]): Iterator[Collision] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val arrivals = in.toSeq.sortBy(h => (h.tsMicros, h.docId))
        val first = state.getOption.getOrElse(
          Holder(arrivals.head.docId, arrivals.head.tsMicros))
        state.update(first)
        val lastMs = arrivals.map(_.tsMicros).max / 1000L
        state.setTimeoutTimestamp(lastMs + ttlSeconds * 1000L)
        arrivals.iterator
          .filter(_.docId != first.docId)
          .map(h => Collision(h.docId, first.docId, key._1, key._2))
      }
    }
    hits.groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
