package graft.multimodal

/** Minimal Netpbm codec (binary PGM `P5` / PPM `P6`, maxval ≤ 255) —
  * pure JVM, no native or third-party libraries, which is exactly why
  * this format is the right first REAL codec for this environment:
  * decode, nearest-neighbor resize, grayscale conversion, and
  * concatenated-frame "video" walking are all genuine byte-level
  * operations, not stubs. Other container formats still fall back to
  * the byte-summary path in [[Multimodal.Codec]]; adding JPEG/PNG
  * support later swaps the codec, not the pipeline.
  *
  * Format: `P6` (or `P5`), whitespace/comments, width, height, maxval,
  * ONE whitespace byte, then `width*height*channels` raster bytes
  * (see netpbm's published format docs).
  */
object Ppm {

  /** Decoded raster: `channels` = 1 (PGM) or 3 (PPM), row-major,
    * interleaved. */
  case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Parses one image starting at `off`; returns (image, next offset)
    * or None if the bytes are not a binary PGM/PPM at that position. */
  def decodeAt(bytes: Array[Byte], off: Int): Option[(Image, Int)] = {
    if (off + 2 > bytes.length || bytes(off) != 'P') return None
    val channels = bytes(off + 1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    var i = off + 2
    // read 3 header ints, skipping whitespace and '#' comments
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < bytes.length &&
        (Character.isWhitespace(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else i += 1
      }
      if (i >= bytes.length || !Character.isDigit(bytes(i))) return None
      // accumulate in Long: a crafted header like "P6 2000000 2000000 255"
      // must not overflow Int and sneak past the raster bounds check
      var x = 0L
      while (i < bytes.length && Character.isDigit(bytes(i))) {
        x = x * 10 + (bytes(i) - '0'); i += 1
        if (x > Int.MaxValue) return None
      }
      vals(v) = x.toInt; v += 1
    }
    val Array(w, h, maxval) = vals
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    i += 1 // the single whitespace byte after maxval
    val nL = w.toLong * h * channels
    if (i.toLong + nL > bytes.length) return None
    val n = nL.toInt
    Some((Image(w, h, channels, java.util.Arrays.copyOfRange(bytes, i, i + n)),
      i + n))
  }

  def decode(bytes: Array[Byte]): Option[Image] = decodeAt(bytes, 0).map(_._1)

  def encode(img: Image): Array[Byte] = {
    val magic = if (img.channels == 1) "P5" else "P6"
    val header = s"$magic\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Nearest-neighbor resample — the standard cheap resize for
    * training-data thumbnailing. */
  def resize(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val src = (sy * img.width + sx) * img.channels
        val dst = (y * w + x) * img.channels
        var c = 0
        while (c < img.channels) { out(dst + c) = img.pixels(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    Image(w, h, img.channels, out)
  }

  /** Integer BT.601-ish luma: (77R + 150G + 29B) >> 8 (exact for PGM). */
  def gray(img: Image): Array[Byte] =
    if (img.channels == 1) img.pixels
    else {
      val out = new Array[Byte](img.width * img.height)
      var p = 0
      while (p < out.length) {
        val r = img.pixels(3 * p) & 0xff
        val g = img.pixels(3 * p + 1) & 0xff
        val b = img.pixels(3 * p + 2) & 0xff
        out(p) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
        p += 1
      }
      out
    }

  /** Walks a concatenated-PPM "video" container: returns the byte
    * offset and decoded image of each frame. */
  def decodeFrames(bytes: Array[Byte]): Seq[(Int, Image)] = {
    val frames = Seq.newBuilder[(Int, Image)]
    var off = 0
    var ok = true
    while (ok && off < bytes.length) {
      decodeAt(bytes, off) match {
        case Some((img, next)) => frames += ((off, img)); off = next
        case None => ok = false
      }
    }
    frames.result()
  }
}
