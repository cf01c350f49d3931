package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sim.Ann

/** Multimodal pipeline: real PGM/PPM codec (decode, resize,
  * frame-walk), schema, determinism, batch shapes, and the media →
  * features → ANN integration path. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("ppm codec: encode → decode round trip, comments, resize, luma") {
    val img = Ppm.Image(6, 4, 3,
      Array.tabulate[Byte](6 * 4 * 3)(i => (i * 7 % 251).toByte))
    val rt = Ppm.decode(Ppm.encode(img)).get
    assert(rt == img.copy(pixels = rt.pixels) && rt.pixels.toSeq == img.pixels.toSeq)
    // header comments per the netpbm spec
    val withComment = "P5\n# a comment\n2 2\n255\n".getBytes ++
      Array[Byte](10, 20, 30, 40)
    val g = Ppm.decode(withComment).get
    assert(g.width == 2 && g.height == 2 && g.channels == 1)
    assert(g.pixels.toSeq == Seq[Byte](10, 20, 30, 40))
    // resize: nearest neighbor, exact on integer upscale
    val up = Ppm.resize(g, 4, 4)
    assert(up.pixels.toSeq == Seq[Byte](
      10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40))
    // luma of a pure-gray RGB pixel equals (77+150+29)*v >> 8 ≈ v
    val rgbGray = Ppm.Image(1, 1, 3, Array[Byte](100, 100, 100))
    assert((Ppm.gray(rgbGray)(0) & 0xff) == 100)
    // truncated raster and bad magic refuse to decode
    assert(Ppm.decode("P6\n4 4\n255\nxy".getBytes).isEmpty)
    assert(Ppm.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("media schema: opaque binary + typed metadata struct") {
    val df = Multimodal.syntheticMedia(spark, 10).toDF()
    assert(df.schema("content").dataType == BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSet ==
      Set("kind", "width", "height", "sampleRate", "durationMs", "format"))
  }

  test("decode REALLY parses the container: dims from bytes, partition-independent") {
    val media = Multimodal.syntheticMedia(spark, 100).repartition(7)
    val d1 = Multimodal.decode(media).collect().sortBy(_.mediaId)
    val d2 = Multimodal.decode(media.repartition(3)).collect().sortBy(_.mediaId)
    assert(d1.toSeq == d2.toSeq) // partitioning-independent
    assert(d1.forall(_.decoded)) // the codec parsed every container
    // raster size follows the DECODED dimensions exactly
    assert(d1.forall(d => d.nBytes == d.width.toLong * d.height * 3))
    // fallback path is labeled
    val blob = Multimodal.decode(
      Multimodal.syntheticMedia(spark, 5, kind = "blob")).collect()
    assert(blob.forall(!_.decoded))
  }

  test("frame sampling walks the real container: byte offsets decode in place") {
    val media = Multimodal.syntheticMedia(spark, 6, kind = "video")
    val frames = Multimodal.sampleFrames(media, strideMs = 100).collect()
    val byId = frames.groupBy(_.mediaId)
    // id % 3 + 2 frames per container, stride finer than frame interval
    assert(byId(0L).length == 2 && byId(1L).length == 3 && byId(2L).length == 4)
    assert(frames.forall(_.offsetBytes >= 0L))
    // each recorded offset is a real frame boundary: decoding there works
    val content = media.filter(_.mediaId == 2L).collect().head.content
    byId(2L).foreach { f =>
      assert(Ppm.decodeAt(content, f.offsetBytes.toInt).isDefined)
    }
    // unparseable container falls back to metadata-stride rows
    val blobFrames = Multimodal.sampleFrames(
      Multimodal.syntheticMedia(spark, 1, kind = "blob"), strideMs = 100).collect()
    assert(blobFrames.length == 10 && blobFrames.forall(_.offsetBytes == -1L))
  }

  test("wav codec: encode/decode round trip, chunk walking, rms frames") {
    val a = Wav.Audio(8000, 2,
      Array.tabulate[Short](1600)(i => ((i * 37) % 20001 - 10000).toShort))
    val rt = Wav.decode(Wav.encode(a)).get
    assert(rt.sampleRate == 8000 && rt.channels == 2)
    assert(rt.samples.toSeq == a.samples.toSeq)
    assert(rt.durationMs == 100L) // 1600 samples / 2 ch / 8000 Hz
    // an extra unknown chunk before data is skipped
    val extra = Wav.encode(a)
    val withJunk = extra.take(12) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4) ++ extra.drop(12)
    val rt2 = Wav.decode(withJunk).get
    assert(rt2.samples.toSeq == a.samples.toSeq)
    assert(rt2.dataOffset == rt.dataOffset + 12)
    // rms of a constant signal equals the constant
    val const = Wav.Audio(8000, 1, Array.fill[Short](800)(1000))
    assert(Wav.rmsFrames(const, 50).forall(r => math.abs(r - 1000.0) < 1e-9))
    // refuse non-wav
    assert(Wav.decode("not audio at all".getBytes).isEmpty)
  }

  test("audio decode parses the real container; frame offsets hit the data chunk") {
    val media = Multimodal.syntheticMedia(spark, 8, kind = "audio")
    val d = Multimodal.decodeAudio(media).collect().sortBy(_.mediaId)
    assert(d.forall(_.decoded))
    assert(d.forall(x => x.sampleRate == 8000 && x.channels == 1 && x.rms > 0))
    // duration comes from the container, not metadata
    assert(d.forall(x => x.durationMs == x.nSamples * 1000 / 8000))
    // frame sampling with real byte offsets inside the data chunk
    val frames = Multimodal.sampleFrames(media, strideMs = 25).collect()
    assert(frames.nonEmpty && frames.forall(_.offsetBytes >= 44L))
    val row0 = media.filter(_.mediaId == 0L).collect().head
    val audio0 = Wav.decode(row0.content).get
    frames.filter(_.mediaId == 0L).foreach { f =>
      assert(f.offsetBytes < row0.content.length)
      assert((f.offsetBytes - audio0.dataOffset) % 2 == 0) // sample-aligned
    }
    // features path uses decoded amplitudes and stays unit-scale
    val sums = Multimodal.featureFrame(media)
      .select(aggregate(col("embedding"), lit(0.0d),
        (s, x) => s + x.cast("double")).as("s")).as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-5))
  }

  test("features are unit-scale LUMA histograms usable by ANN top-k") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val feats = Multimodal.featureFrame(media)
    assert(feats.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = false))
    // histogram sums to ~1 (normalized by pixel count)
    val sums = feats.select(aggregate(col("embedding"), lit(0.0d),
      (s, x) => s + x.cast("double")).as("s")).as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-5))
    // e2e: nearest neighbors over media features
    val topk = Ann.bruteForceTopK(feats, feats.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 2)
    assert(topk.count() == 6L)
    assert(topk.filter(col("id_q") === col("id_n")).count() == 0L)
  }

  test("resize resamples the actual raster and re-encodes") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val resized = Multimodal.resize(media, 8, 8).collect()
    resized.foreach { r =>
      assert(r.meta.width == 8 && r.meta.height == 8)
      val img = Ppm.decode(r.content).get
      assert(img.width == 8 && img.height == 8)
      assert(img.pixels.length == 8 * 8 * 3)
    }
    // metadata-only variant leaves content untouched
    val metaOnly = Multimodal.resizeMeta(media, 224, 224).collect()
    assert(metaOnly.forall(r => Ppm.decode(r.content).get.width != 224))
  }
}
