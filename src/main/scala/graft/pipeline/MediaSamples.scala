package graft.pipeline

/** Sample/pixel-level media decoding, pure JVM — retires the last
  * declared codec stub (VERDICT r6 "next round" #6) for the two
  * containers whose coding layer the JDK actually ships: PNG's DEFLATE
  * (java.util.zip.Inflater) and WAV's uncompressed PCM. JPEG (DCT +
  * arithmetic/huffman entropy coding) and GIF (LZW) stay header-only —
  * codec-bound, declared out in SURVEY §2.
  *
  * Clean-room from the public specs:
  *  - PNG: RFC 2083 / W3C PNG spec — chunk framing + CRC32, IHDR,
  *    IDAT concatenation, zlib inflate, per-scanline de-filtering
  *    (None/Sub/Up/Average/Paeth, spec §6); supports 8-bit depth,
  *    grayscale (type 0) and truecolor (type 2), non-interlaced.
  *  - WAV: RIFF/WAVE with PCM `fmt ` (format tag 1), 8-bit unsigned or
  *    16-bit signed little-endian samples.
  */
object MediaSamples {

  final case class Decoded(format: String, samples: Array[Int])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def beU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Decode to a flat sample array: PNG → channel bytes in scanline
    * order (grayscale: one per pixel), WAV → PCM sample values
    * (channel-interleaved). Returns null on unsupported/corrupt input
    * (mirrors the header decoder's unknown-format contract). */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null) null
    else if (b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') decodePng(b)
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V') decodeWav(b)
    else null
  }

  /** PNG spec §6 Paeth predictor. */
  private def paeth(a: Int, bb: Int, c: Int): Int = {
    val p = a + bb - c
    val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
  }

  def decodePng(b: Array[Byte]): Decoded = {
    var i = 8
    var w = 0; var h = 0; var depth = 0; var colorType = 0; var interlace = 0
    val idat = new java.io.ByteArrayOutputStream
    var sawIhdr = false
    while (i + 8 <= b.length) {
      val len = beU32(b, i).toInt
      if (len < 0 || i + 12 + len > b.length) return null
      val tag = new String(b, i + 4, 4, "US-ASCII")
      // chunk CRC covers tag + payload (spec §5.3)
      val crc = new java.util.zip.CRC32
      crc.update(b, i + 4, 4 + len)
      if (crc.getValue != beU32(b, i + 8 + len)) return null
      tag match {
        case "IHDR" =>
          if (len < 13) return null
          w = beU32(b, i + 8).toInt; h = beU32(b, i + 12).toInt
          depth = u8(b, i + 16); colorType = u8(b, i + 17)
          interlace = u8(b, i + 20)
          sawIhdr = true
        case "IDAT" => idat.write(b, i + 8, len)
        case _ => ()
      }
      i += 12 + len
    }
    if (!sawIhdr || depth != 8 || interlace != 0 ||
      (colorType != 0 && colorType != 2)) return null
    val bpp = if (colorType == 0) 1 else 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (off != raw.length) return null
    // de-filter in place into the output sample array (spec §6.2):
    // Recon(x) = Filt(x) + predictor over left/up/up-left RECON bytes
    val out = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw((stride + 1) * y) & 0xFF
      val rowIn = (stride + 1) * y + 1
      val rowOut = stride * y
      var x = 0
      while (x < stride) {
        val filt = raw(rowIn + x) & 0xFF
        val left = if (x >= bpp) out(rowOut + x - bpp) else 0
        val up = if (y > 0) out(rowOut - stride + x) else 0
        val upLeft = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) else 0
        val recon = filter match {
          case 0 => filt
          case 1 => filt + left
          case 2 => filt + up
          case 3 => filt + ((left + up) >> 1)
          case 4 => filt + paeth(left, up, upLeft)
          case _ => return null
        }
        out(rowOut + x) = recon & 0xFF
        x += 1
      }
      y += 1
    }
    Decoded("png", out)
  }

  def decodeWav(b: Array[Byte]): Decoded = {
    var i = 12
    var bits = 0; var fmtTag = 0
    var samples: Array[Int] = null
    while (i + 8 <= b.length) {
      val tag = new String(b, i, 4, "US-ASCII")
      val len = leU32(b, i + 4).toInt
      if (len < 0 || i + 8 + len > b.length) return null
      tag match {
        case "fmt " =>
          if (len < 16) return null
          fmtTag = leU16(b, i + 8)
          bits = leU16(b, i + 22)
        case "data" =>
          if (fmtTag != 1) return null // PCM only
          bits match {
            case 8 =>
              samples = Array.tabulate(len)(k => u8(b, i + 8 + k))
            case 16 =>
              samples = Array.tabulate(len / 2) { k =>
                (leU16(b, i + 8 + 2 * k) << 16) >> 16 // sign-extend
              }
            case _ => return null
          }
        case _ => ()
      }
      i += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (samples == null) null else Decoded("wav", samples)
  }
}
