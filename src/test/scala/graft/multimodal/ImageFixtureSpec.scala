package graft.multimodal

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The committed image-dedup fixtures are not self-certifying: the
  * gate's oracle reads `fixtures/image_dhash.parquet`, so this spec
  * independently recomputes every hash from the committed PPM BYTES
  * (decode included — the same path the gated query runs) and pins
  * the corpus structure that makes the query meaningful: planted
  * brightness/upscale twins at Hamming 0 (see
  * tools/DumpImageFixtures for the corpus layout).
  */
class ImageFixtureSpec extends SparkSpec {

  private val fixtures = "/root/repo/fixtures"

  private def committedHashes: Map[Long, Long] = {
    import spark.implicits._
    spark.read.parquet(s"$fixtures/image_dhash.parquet")
      .as[(Long, Long)].collect().toMap
  }

  private def fileHash(id: Long): Long = {
    val bytes = Files.readAllBytes(Paths.get(s"$fixtures/images/img_$id.ppm"))
    ImageDedup.dHash(Ppm.decode(bytes).get)
  }

  test("committed hash table == dHash of committed PPM bytes, all 70") {
    val committed = committedHashes
    assert(committed.size == 70)
    committed.foreach { case (id, h) =>
      assert(fileHash(id) == h, s"hash drift for img_$id.ppm")
    }
  }

  test("planted twins: brightness +8 and 2x upscale are dHash-identical") {
    val committed = committedHashes
    (0L until 10L).foreach { k =>
      assert(committed(100L + k) == committed(k),
        s"brightness twin $k not Hamming-0")
      assert(committed(200L + k) == committed(k),
        s"upscale twin $k not Hamming-0")
    }
  }

  test("corpus generator reproduces the committed files byte-for-byte") {
    graft.tools.DumpImageFixtures.corpus.foreach { case (id, img) =>
      val onDisk = Files.readAllBytes(Paths.get(s"$fixtures/images/img_$id.ppm"))
      assert(java.util.Arrays.equals(Ppm.encode(img), onDisk),
        s"generator drift for img_$id.ppm — rerun DumpImageFixtures")
    }
  }
}
