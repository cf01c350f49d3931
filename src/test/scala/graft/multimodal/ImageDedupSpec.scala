package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** Perceptual image dedup: dHash invariances (the reason it works)
  * and the banded near-dup join. */
class ImageDedupSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic grayscale gradient-ish test image. */
  private def img(w: Int, h: Int, salt: Long): Ppm.Image =
    Ppm.Image(w, h, 3, Array.tabulate[Byte](w * h * 3) { i =>
      val p = i / 3
      (((p % w) * 29 + (p / w) * 53 + salt * 97 + (i % 3)) % 251).toByte
    })

  test("dHash is resolution-independent and brightness-shift tolerant") {
    val base = img(32, 24, 1)
    val up = Ppm.resize(base, 64, 48)
    assert(ImageDedup.dHash(base) == ImageDedup.dHash(Ppm.resize(base, 32, 24)))
    // nearest-neighbor upscale preserves the 9x8 thumbnail exactly
    assert(ImageDedup.dHash(up) == ImageDedup.dHash(base))
    // uniform brightness shift preserves all gradient signs
    val brighter = base.copy(pixels = base.pixels.map(b =>
      math.min(255, (b & 0xff) + 10).toByte))
    assert(ImageDedup.dHash(brighter) == ImageDedup.dHash(base))
    // a different image hashes differently
    assert(ImageDedup.dHash(img(32, 24, 5)) != ImageDedup.dHash(base))
  }

  test("nearDupPairs finds perturbed duplicates, not distinct images") {
    val rows = (0 until 12).map { i =>
      val base = img(24, 16, i.toLong)
      MediaRow(i.toLong, "image", Ppm.encode(base),
        MediaMeta("image", 24, 16, 0, 0L, "ppm"))
    } ++ Seq({
      // id 100: a brightness-shifted copy of image 0 (near-dup)
      val b = img(24, 16, 0L)
      val shifted = b.copy(pixels = b.pixels.map(x =>
        math.min(255, (x & 0xff) + 8).toByte))
      MediaRow(100L, "image", Ppm.encode(shifted),
        MediaMeta("image", 24, 16, 0, 0L, "ppm"))
    }, // id 101: undecodable bytes — must be dropped, not crash
      MediaRow(101L, "image", Array[Byte](1, 2, 3),
        MediaMeta("image", 0, 0, 0, 0L, "raw")))
    val media = spark.createDataset(rows.toSeq)
    val pairs = ImageDedup.nearDupPairs(media, maxHamming = 2)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 100L })
    // the hash stage drops the undecodable row
    assert(!pairs.exists { case (a, b, _) => a == 101L || b == 101L })
    val hs = ImageDedup.hashes(media).as[(Long, Long)].collect().toMap
    assert(!hs.contains(101L) && hs.size == 13)
  }
}
