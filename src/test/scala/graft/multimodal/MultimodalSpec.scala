package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sim.Ann

/** Multimodal plumbing: schema, determinism, batch shapes, and the
  * media → features → ANN integration path. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("media schema: opaque binary + typed metadata struct") {
    val df = Multimodal.syntheticMedia(spark, 10).toDF()
    assert(df.schema("content").dataType == BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSet ==
      Set("kind", "width", "height", "sampleRate", "durationMs", "format"))
  }

  test("decode is deterministic and partition-shaped") {
    val media = Multimodal.syntheticMedia(spark, 100).repartition(7)
    val d1 = Multimodal.decode(media).collect().sortBy(_.mediaId)
    val d2 = Multimodal.decode(media.repartition(3)).collect().sortBy(_.mediaId)
    assert(d1.toSeq == d2.toSeq) // partitioning-independent
    assert(d1.forall(d => d.nBytes >= 64 && d.meanByte > 0))
  }

  test("frame sampling explodes per container metadata") {
    val media = Multimodal.syntheticMedia(spark, 5, kind = "video")
    val frames = Multimodal.sampleFrames(media, strideMs = 100).collect()
    val byId = frames.groupBy(_.mediaId)
    assert(byId(0L).length == 10)  // 1000ms / 100
    assert(byId(4L).length == 11)  // 1160ms / 100
    assert(byId(4L).map(_.offsetMs).sorted.last == 1000L)
  }

  test("features are unit-scale histograms usable by ANN top-k") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val feats = Multimodal.featureFrame(media)
    assert(feats.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = false))
    // histogram sums to ~1 (normalized by length)
    val sums = feats.select(aggregate(col("embedding"), lit(0.0d),
      (s, x) => s + x.cast("double")).as("s")).as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-5))
    // e2e: nearest neighbors over media features
    val topk = Ann.bruteForceTopK(feats, feats.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 2)
    assert(topk.count() == 6L)
    assert(topk.filter(col("id_q") === col("id_n")).count() == 0L)
  }

  test("resize updates metadata consistently") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val resized = Multimodal.resizeMeta(media, 224, 224).collect()
    assert(resized.forall(r => r.meta.width == 224 && r.meta.height == 224))
    assert(resized.forall(r => r.content.nonEmpty)) // content untouched
  }
}
