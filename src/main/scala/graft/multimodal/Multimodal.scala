package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns + a typed metadata struct, with
  * decode / feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing is real and tested — schema, partition/batch
  * shape, operator signatures, deterministic outputs. The actual codec
  * calls are STUBBED behind [[Codec]] (no image/audio libraries in this
  * environment): `decode` produces a deterministic fake raster derived
  * from the bytes. Swapping in a real codec (JNI/javacv/etc.) changes
  * ONE function, not the pipeline.
  *
  * Scale shape: all operators are `mapPartitions` over the binary
  * column — embarrassingly parallel, no shuffle; heavy rows are
  * bounded by `spark.sql.files.maxPartitionBytes` at scan time, and
  * decode amortizes per-partition setup (a real codec context) across
  * the partition's rows, which is why the batch boundary is a
  * partition and not a row.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
    sampleRate: Int, durationMs: Long, format: String)

  case class MediaRow(mediaId: Long, kind: String, content: Array[Byte],
    meta: MediaMeta)

  /** Decoded raster summary (what a real decoder would hand to feature
    * extraction; `pixels` stays OFF this row — only per-batch summaries
    * leave the decode stage, the full raster lives only inside the
    * partition iterator). */
  case class Decoded(mediaId: Long, width: Int, height: Int,
    nBytes: Long, meanByte: Double)

  case class Frame(mediaId: Long, frameIdx: Int, offsetMs: Long)

  case class MediaFeature(mediaId: Long, feature: Seq[Float])

  /** The codec boundary. STUB: a real implementation would call an
    * image/audio library here; this one derives a deterministic fake
    * raster from the bytes so the pipeline around it is fully
    * exercised and reproducible. */
  object Codec extends Serializable {
    /** ??? in spirit — fake decode: the "raster" is the content bytes;
      * dimensions come from metadata (a real codec reads them from the
      * container). */
    def decode(row: MediaRow): Decoded = {
      val bytes = row.content
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / bytes.length
      Decoded(row.mediaId, row.meta.width, row.meta.height,
        bytes.length.toLong, mean)
    }
  }

  /** Deterministic synthetic media fixture (seeded by id) — stands in
    * for a real binary scan (`spark.read.format("binaryFile")` or a
    * parquet table with a binary column). */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image")
      : Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val len = 64 + (id * 37 % 192).toInt
      val bytes = Array.tabulate[Byte](len)(i =>
        (((id + 7) * 2654435761L + i * 131L) % 251).toByte)
      MediaRow(id, kind, bytes,
        MediaMeta(kind, 4 + (id % 8).toInt, 4 + (id % 5).toInt,
          16000, 1000L + id * 40L, "fake"))
    }
  }

  /** Decode stage: partition-wise batch over the binary column. */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // a real codec would open its context once per partition here
      it.map(Codec.decode)
    }
  }

  /** Feature extraction: 32-bin normalized byte histogram per media
    * row (a real, deterministic feature — not a stub — usable by the
    * ANN/near-dup operators downstream). */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val hist = new Array[Float](32)
        row.content.foreach(b => hist((b & 0xff) / 8) += 1f)
        val n = math.max(1, row.content.length).toFloat
        MediaFeature(row.mediaId, hist.toSeq.map(_ / n))
      }
    }
  }

  /** Frame sampling plumbing for video/audio: emits (frame, offset)
    * rows at a fixed stride from the container metadata — the row
    * explosion is real; a real implementation would also attach the
    * decoded frame bytes. */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      val n = (row.meta.durationMs / strideMs).toInt
      (0 until n).map(i => Frame(row.mediaId, i, i * strideMs))
    }
  }

  /** Resize plumbing: metadata-level transform (real resize happens in
    * the codec); demonstrates the metadata struct staying consistent
    * through the pipeline. */
  def resizeMeta(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Features as a DataFrame ready for [[graft.sim.Ann]] (id + float
    * array columns). */
  def featureFrame(media: Dataset[MediaRow]): DataFrame =
    features(media).toDF("vec_id", "embedding")
}
