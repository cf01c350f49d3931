package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** JPEG/PNG (and whatever other readers the JDK registers — GIF, BMP,
  * TIFF on 17) at the codec seam `Multimodal.Codec` documents:
  * `javax.imageio` is JDK-builtin, dependency-free, and headless-safe.
  * Decodes into [[Ppm.Image]] (3-channel RGB bytes) so every
  * downstream raster operator — [[Ppm.gray]] luma, [[Ppm.resize]],
  * histogram features — is shared with the Netpbm path rather than
  * duplicated per container format.
  */
object ImageIo {

  /** Decode any ImageIO-supported container to an RGB raster; None if
    * no registered reader claims the bytes (the labeled byte-summary
    * fallback stays the terminal case). */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) None
        else {
          val px = new Array[Byte](w * h * 3)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val rgb = row(x)
              val p = (y * w + x) * 3
              px(p) = ((rgb >> 16) & 0xff).toByte
              px(p + 1) = ((rgb >> 8) & 0xff).toByte
              px(p + 2) = (rgb & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some(Ppm.Image(w, h, 3, px))
        }
      }
    } catch { case _: Exception => None }

  private def toBuffered(img: Ppm.Image): BufferedImage = {
    val buf = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * img.channels
        val (r, g, b) =
          if (img.channels == 1) {
            val v = img.pixels(p) & 0xff; (v, v, v)
          } else
            (img.pixels(p) & 0xff, img.pixels(p + 1) & 0xff, img.pixels(p + 2) & 0xff)
        buf.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    buf
  }

  /** Re-encode a raster as PNG (lossless — JPEG would change pixel
    * values on every resize hop). */
  def encodePng(img: Ppm.Image): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(toBuffered(img), "png", out)
    out.toByteArray
  }

  /** Encode a raster as JPEG at an explicit quality (the default
    * writer setting varies by platform; pinning it keeps fixture
    * bytes reproducible on one JDK). Lossy by design — fixture twins
    * encoded this way land at small nonzero Hamming, not 0. */
  def encodeJpeg(img: Ppm.Image, quality: Float = 0.9f): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageWriteParam}
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(toBuffered(img), null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }
}
