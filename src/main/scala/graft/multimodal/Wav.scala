package graft.multimodal

/** Minimal RIFF/WAVE codec for 16-bit PCM — pure JVM, no libraries
  * (same rationale as [[Ppm]]: a REAL container parse for the audio
  * modality, with richer formats pluggable later). Little-endian
  * throughout per the RIFF spec; unknown chunks are skipped.
  */
object Wav {

  /** Interleaved 16-bit PCM. `dataOffset` = byte position of the
    * first sample in the source container (for offset-accurate frame
    * sampling). */
  case class Audio(sampleRate: Int, channels: Int, samples: Array[Short],
      dataOffset: Int = 44) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else nFrames.toLong * 1000L / sampleRate
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var dataOff = 0
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, off + 4)
      // Long arithmetic: off + 8 + size can overflow Int for crafted
      // chunk sizes near 2^31 and bypass the bounds check
      if (size < 0 || off.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmt = le16(bytes, off + 8)
          if (fmt != 1) return None // PCM only
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          if (bits != 16 || channels <= 0 || rate <= 0) return None
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = le16(bytes, off + 8 + 2 * i).toShort; i += 1 }
          samples = out
          dataOff = off + 8
        case _ => () // skip unknown chunk
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (rate > 0 && samples != null)
      Some(Audio(rate, channels, samples, dataOff))
    else None
  }

  def encode(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(a.channels.toShort)
    bb.putInt(a.sampleRate)
    bb.putInt(a.sampleRate * a.channels * 2)       // byte rate
    bb.putShort((a.channels * 2).toShort)          // block align
    bb.putShort(16)                                // bits per sample
    bb.put("data".getBytes); bb.putInt(dataSize)
    a.samples.foreach(bb.putShort)
    bb.array()
  }

  /** Root-mean-square amplitude per fixed-length frame window — the
    * standard cheap audio feature (silence/energy profiling). */
  def rmsFrames(a: Audio, frameMs: Int): Array[Double] = {
    val perFrame = math.max(1, a.sampleRate * frameMs / 1000) * a.channels
    a.samples.grouped(perFrame).map { w =>
      math.sqrt(w.foldLeft(0.0)((s, x) => s + x.toDouble * x) / w.length)
    }.toArray
  }
}
