package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.{Codec, MediaRow}

/** Perceptual image dedup — the raster counterpart of the text
  * SimHash family: a 64-bit difference hash (dHash) per image, then
  * the banded-pigeonhole candidate join + bit_count verification
  * pattern of [[graft.dedup.Dedup.simhashPairs]].
  *
  * dHash: decode → 9×8 luma thumbnail (the repo's nearest-neighbor
  * resizer) → bit (x,y) set iff luma(x+1,y) > luma(x,y). Horizontal
  * gradient signs survive re-encoding, small blurs, and brightness
  * shifts, so Hamming-near hashes ≈ perceptually-near images —
  * resolution-independent because both images are compared at 9×8.
  *
  * Scale shape: hashing is mapPartitions over the media rows (only
  * (id, 8-byte hash) leaves the stage — never rasters); candidates
  * share one of eight 8-bit bands (pigeonhole: Hamming ≤ 7 ⇒ some
  * band unchanged), an equi-join; verification is bit_count on the
  * inline 16-byte (id, hash) structs. Non-image rows (undecodable
  * content) are dropped from the hash stage.
  */
object ImageDedup {

  /** 64-bit dHash of a decoded raster. */
  def dHash(img: Ppm.Image): Long = {
    val g = Ppm.gray(Ppm.resize(img, 9, 8))
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((g(y * 9 + x + 1) & 0xff) > (g(y * 9 + x) & 0xff)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** (mediaId, dhash) for every decodable image row. */
  def hashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(row => Codec.raster(row.content).map(img => (row.mediaId, dHash(img))))
    }.toDF("media_id", "dhash")
  }

  /** Near-dup image pairs with Hamming distance ≤ `maxHamming` (≤ 7
    * for the full pigeonhole guarantee over 8 bands). */
  def nearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 6): DataFrame = {
    val fp = hashes(media).select(col("media_id").as("_id"), col("dhash").as("_fp"))
    val banded = fp.select(struct(col("_id"), col("_fp")).as("_it"),
      posexplode(array((0 until 8).map(i =>
        shiftright(col("_fp"), i * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("_band", "_key")))
    banded.groupBy("_band", "_key").agg(collect_list(col("_it")).as("_items"))
      .select(explode(col("_items")).as("_a"), col("_items"))
      .select(col("_a"), explode(col("_items")).as("_b"))
      .filter(col("_a")("_id") < col("_b")("_id"))
      .select(col("_a")("_id").as("id_a"), col("_b")("_id").as("id_b"),
        bit_count(col("_a")("_fp").bitwiseXOR(col("_b")("_fp")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
