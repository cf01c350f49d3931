package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns + a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The codec is REAL for Netpbm rasters ([[Ppm]]: binary PGM/PPM
  * decode, nearest-neighbor resize, luma conversion, concatenated-
  * frame video walking — pure JVM, no external libraries). Any other
  * container falls back to a deterministic byte-summary path, clearly
  * marked in [[Codec.decode]]; adding JPEG/PNG later swaps that one
  * function, not the pipeline.
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

  /** Decoded raster summary (the full raster lives only inside the
    * partition iterator; only per-row summaries leave the decode
    * stage). `decoded` = a real codec parsed the container; false =
    * byte-summary fallback. */
  case class Decoded(mediaId: Long, width: Int, height: Int,
    nBytes: Long, meanByte: Double, decoded: Boolean)

  case class Frame(mediaId: Long, frameIdx: Int, offsetMs: Long,
    offsetBytes: Long)

  /** Decoded-audio summary (the WAV analogue of [[Decoded]]). */
  case class DecodedAudio(mediaId: Long, sampleRate: Int, channels: Int,
    nSamples: Long, durationMs: Long, rms: Double, decoded: Boolean)

  case class MediaFeature(mediaId: Long, feature: Seq[Float])

  /** The codec boundary: PGM/PPM decode for real, then any
    * ImageIO-registered container (JPEG/PNG/GIF/BMP/TIFF — JDK
    * builtin, [[ImageIo]]); anything else gets the labeled
    * byte-summary fallback (dims from metadata, mean over raw
    * bytes). */
  object Codec extends Serializable {
    /** Raster decode across every real codec this engine carries. */
    def raster(bytes: Array[Byte]): Option[Ppm.Image] =
      Ppm.decode(bytes).orElse(ImageIo.decode(bytes))

    def decode(row: MediaRow): Decoded =
      raster(row.content) match {
        case Some(img) =>
          val px = img.pixels
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i) & 0xff; i += 1 }
          Decoded(row.mediaId, img.width, img.height, px.length.toLong,
            if (px.isEmpty) 0.0 else s.toDouble / px.length, decoded = true)
        case None =>
          val bytes = row.content
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / bytes.length
          Decoded(row.mediaId, row.meta.width, row.meta.height,
            bytes.length.toLong, mean, decoded = false)
      }
  }

  /** Deterministic synthetic media fixture (seeded by id) — real P6
    * rasters for "image", concatenated P6 frames for "video", raw
    * bytes for anything else; stands in for a binary scan
    * (`spark.read.format("binaryFile")` / parquet binary column). */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image")
      : Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val w = 4 + (id % 8).toInt
      val h = 4 + (id % 5).toInt
      def frame(salt: Long): Ppm.Image = Ppm.Image(w, h, 3,
        Array.tabulate[Byte](w * h * 3)(i =>
          (((id + 7 + salt) * 2654435761L + i * 131L) % 251).toByte))
      val durationMs = 1000L + id * 40L
      val content = kind match {
        case "image" => Ppm.encode(frame(0))
        case "video" =>
          val nFrames = 2 + (id % 3).toInt
          (0L until nFrames.toLong).toArray.flatMap(f => Ppm.encode(frame(f)))
        case "audio" =>
          // real 16-bit PCM WAV: deterministic sawtooth-ish signal
          val rate = 8000
          val n = rate / 10 + (id % 7).toInt * 100 // 100ms-ish
          Wav.encode(Wav.Audio(rate, 1,
            Array.tabulate[Short](n)(i =>
              (((id + 3) * 2654435761L + i * 977L) % 20001 - 10000).toShort)))
        case _ =>
          val len = 64 + (id * 37 % 192).toInt
          Array.tabulate[Byte](len)(i =>
            (((id + 7) * 2654435761L + i * 131L) % 251).toByte)
      }
      val fmt = kind match {
        case "image" | "video" => "ppm"
        case "audio" => "wav"
        case _ => "raw"
      }
      MediaRow(id, kind, content, MediaMeta(kind, w, h, 8000, durationMs, fmt))
    }
  }

  /** Decode stage: partition-wise batch over the binary column. */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // a real heavyweight codec would open its context once per
      // partition here
      it.map(Codec.decode)
    }
  }

  /** Feature extraction: 32-bin normalized histogram per media row —
    * over decoded LUMA pixels (raster), absolute-amplitude high bytes
    * (PCM audio), or raw bytes (fallback). Deterministic and usable by
    * the ANN/near-dup operators downstream. */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val data: Array[Byte] = Codec.raster(row.content) match {
          case Some(img) => Ppm.gray(img)
          case None => Wav.decode(row.content) match {
            case Some(a) => a.samples.map(s => (math.abs(s.toInt) >> 7).toByte)
            case None => row.content
          }
        }
        val hist = new Array[Float](32)
        data.foreach(b => hist((b & 0xff) / 8) += 1f)
        val n = math.max(1, data.length).toFloat
        MediaFeature(row.mediaId, hist.toSeq.map(_ / n))
      }
    }
  }

  /** Audio decode stage: real WAV parse (sample rate, channel count,
    * duration from the container bytes; RMS amplitude) with a labeled
    * fallback for unknown containers. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        Wav.decode(row.content) match {
          case Some(a) =>
            val rms =
              if (a.samples.isEmpty) 0.0
              else math.sqrt(a.samples.foldLeft(0.0)((s, x) =>
                s + x.toDouble * x) / a.samples.length)
            DecodedAudio(row.mediaId, a.sampleRate, a.channels,
              a.samples.length.toLong, a.durationMs, rms, decoded = true)
          case None =>
            DecodedAudio(row.mediaId, row.meta.sampleRate, 0,
              row.content.length.toLong, row.meta.durationMs, 0.0,
              decoded = false)
        }
      }
    }
  }

  /** Real resize for parseable rasters: nearest-neighbor resample,
    * re-encoded in the source family (Netpbm stays Netpbm; ImageIO
    * containers re-encode lossless PNG), metadata updated.
    * Unparseable content passes through with metadata-only update
    * (documented fallback). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      Ppm.decode(r.content) match {
        case Some(img) =>
          r.copy(content = Ppm.encode(Ppm.resize(img, w, h)),
            meta = r.meta.copy(width = w, height = h))
        case None => ImageIo.decode(r.content) match {
          case Some(img) =>
            r.copy(content = ImageIo.encodePng(Ppm.resize(img, w, h)),
              meta = r.meta.copy(width = w, height = h, format = "png"))
          case None => r.copy(meta = r.meta.copy(width = w, height = h))
        }
      }
    }
  }

  /** Metadata-only resize (kept for pipelines that defer the pixel
    * work to a downstream codec). */
  def resizeMeta(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Frame sampling: for concatenated-raster video containers the
    * walk is REAL — every frame's byte offset comes from parsing the
    * container — with frame→time mapping from container duration;
    * unparseable containers fall back to metadata-stride rows
    * (offsetBytes = -1). */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      val frames = Ppm.decodeFrames(row.content)
      if (frames.nonEmpty) {
        val frameMs = row.meta.durationMs / frames.size
        frames.zipWithIndex.collect {
          case ((off, _), i) if i.toLong * frameMs % strideMs < frameMs =>
            Frame(row.mediaId, i, i.toLong * frameMs, off.toLong)
        }
      } else Wav.decode(row.content) match {
        case Some(a) if a.durationMs > 0 =>
          // real PCM windows: byte offset of each stride start inside
          // the data chunk
          val n = ((a.durationMs + strideMs - 1) / strideMs).toInt
          val bytesPerStride = (a.sampleRate * strideMs / 1000).toInt *
            a.channels * 2
          (0 until n).map(i => Frame(row.mediaId, i, i * strideMs,
            a.dataOffset.toLong + bytesPerStride.toLong * i))
        case _ =>
          val n = (row.meta.durationMs / strideMs).toInt
          (0 until n).map(i => Frame(row.mediaId, i, i * strideMs, -1L))
      }
    }
  }

  /** Features as a DataFrame ready for [[graft.sim.Ann]] (id + float
    * array columns). */
  def featureFrame(media: Dataset[MediaRow]): DataFrame =
    features(media).toDF("vec_id", "embedding")
}
