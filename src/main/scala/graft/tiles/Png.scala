package graft.tiles

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal lock-free PNG codec (public PNG spec, RFC 2083).
  *
  * Why not javax.imageio: ImageIO.read serializes internally past ~8
  * threads (measured on this box: 95k decodes/s at 8 threads → only 150k at
  * 32), which caps any decode-bound Spark job at ~0.4 scaling efficiency.
  * This codec uses only per-instance Inflater/Deflater state, so decode
  * throughput scales with cores — the property the north rule's ≥0.8
  * efficiency target needs.
  *
  * Supported: 8-bit truecolor (color type 2) and truecolor+alpha (type 6,
  * alpha dropped), non-interlaced, all five scanline filters. Exactly what
  * our fixture generator and common tooling emit; anything else should go
  * through an external codec.
  */
final case class Img(w: Int, h: Int, px: Array[Int]) {
  @inline def rgb(x: Int, y: Int): Int = px(y * w + x)
}

object Png {
  private val Magic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && Magic.indices.forall(i => bytes(i) == Magic(i))

  // ---------------------------------------------------------------- encode
  def encode(img: Img): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(img.px.length / 2 + 128)
    out.write(Magic)
    val ihdr = new Array[Byte](13)
    writeInt(ihdr, 0, img.w)
    writeInt(ihdr, 4, img.h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // truecolor
    // compression/filter/interlace = 0
    chunk(out, "IHDR", ihdr)
    // raw scanlines, filter type 0 (None)
    val raw = new Array[Byte](img.h * (1 + img.w * 3))
    var i = 0
    var y = 0
    while (y < img.h) {
      raw(i) = 0
      i += 1
      var x = 0
      while (x < img.w) {
        val p = img.rgb(x, y)
        raw(i) = ((p >> 16) & 0xff).toByte
        raw(i + 1) = ((p >> 8) & 0xff).toByte
        raw(i + 2) = (p & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    val d = new Deflater(Deflater.BEST_SPEED)
    val compressed = try {
      d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      buf.toByteArray
    } finally d.end()
    chunk(out, "IDAT", compressed)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def chunk(out: java.io.ByteArrayOutputStream, name: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    writeInt(len, 0, data.length)
    out.write(len)
    val nameBytes = name.getBytes("US-ASCII")
    out.write(nameBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(nameBytes)
    crc.update(data)
    val c = new Array[Byte](4)
    writeInt(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  // ---------------------------------------------------------------- decode

  private final val IHDR = 0x49484452
  private final val IDAT = 0x49444154
  private final val IEND = 0x49454e44

  /** One-shot decode: allocates fresh buffers. For hot loops (millions of
    * images per task) use a per-thread [[Decoder]] instead — it reuses the
    * native Inflater and all byte/int buffers across calls, which cuts the
    * allocation rate ~20x and keeps young-gen GC off the scaling-critical
    * path. */
  def decode(bytes: Array[Byte]): Img = {
    val d = new Decoder()
    try {
      d.decode(bytes)
      Img(d.w, d.h, java.util.Arrays.copyOf(d.px, d.w * d.h))
    } finally d.close()
  }

  /** Reusable PNG decode state: one native Inflater (reset per image rather
    * than malloc/free per image) plus grow-only scratch buffers. NOT
    * thread-safe — hold one per thread (see Images.parityStats). After
    * decode(), `w`/`h` are the dimensions and the first w*h entries of `px`
    * are 0xRRGGBB pixels; the buffer is overwritten by the next decode. */
  final class Decoder {
    private val inflater = new Inflater()
    private var raw = Array.emptyByteArray
    private var pxBuf = new Array[Int](0)
    private var prev = Array.emptyByteArray
    private var cur = Array.emptyByteArray
    private var idatBuf = Array.emptyByteArray // only for multi-IDAT files
    var w = 0
    var h = 0
    def px: Array[Int] = pxBuf

    def close(): Unit = inflater.end()

    def decode(bytes: Array[Byte]): Unit = {
      require(isPng(bytes), "not a PNG")
      var pos = 8
      w = 0; h = 0
      var colorType = -1
      var bitDepth = -1
      var interlace = 0
      var idatOff = -1
      var idatLen = 0
      var idatTotal = 0
      var idatChunks = 0
      var done = false
      while (!done && pos + 8 <= bytes.length) {
        val len = readInt(bytes, pos)
        // negative/overflowing chunk length would stall or wrap the walk
        // (same guard as the Avi/Wav container walks) — fail, don't hang
        require(len >= 0 && pos + 8L + len + 4L <= bytes.length,
          s"corrupt PNG chunk length $len at offset $pos")
        val typ = readInt(bytes, pos + 4)
        val dataOff = pos + 8
        typ match {
          case IHDR =>
            w = readInt(bytes, dataOff)
            h = readInt(bytes, dataOff + 4)
            bitDepth = bytes(dataOff + 8) & 0xff
            colorType = bytes(dataOff + 9) & 0xff
            interlace = bytes(dataOff + 12) & 0xff
          case IDAT =>
            if (idatChunks == 0) { idatOff = dataOff; idatLen = len }
            idatChunks += 1
            idatTotal += len
          case IEND => done = true
          case _ => () // ancillary chunks skipped
        }
        pos = dataOff + len + 4 // skip CRC
      }
      require(bitDepth == 8 && (colorType == 2 || colorType == 6) && interlace == 0,
        s"unsupported PNG shape: depth=$bitDepth color=$colorType interlace=$interlace")
      val bpp = if (colorType == 2) 3 else 4
      val stride = w * bpp
      val rawLen = h * (1 + stride)
      if (raw.length < rawLen) raw = new Array[Byte](rawLen)
      if (prev.length < stride) {
        prev = new Array[Byte](stride)
        cur = new Array[Byte](stride)
      }
      if (pxBuf.length < w * h) pxBuf = new Array[Int](w * h)
      java.util.Arrays.fill(prev, 0, stride, 0.toByte) // buffers are reused

      inflater.reset()
      if (idatChunks == 1) {
        // fast path (our encoder and most tooling): inflate straight from
        // the input slice, no IDAT concatenation copy
        inflater.setInput(bytes, idatOff, idatLen)
      } else {
        if (idatBuf.length < idatTotal) idatBuf = new Array[Byte](idatTotal)
        var p = 8
        var o = 0
        var d2 = false
        while (!d2 && p + 8 <= bytes.length) {
          val len = readInt(bytes, p)
          require(len >= 0 && p + 8L + len + 4L <= bytes.length,
            s"corrupt PNG chunk length $len at offset $p")
          val typ = readInt(bytes, p + 4)
          if (typ == IDAT) { System.arraycopy(bytes, p + 8, idatBuf, o, len); o += len }
          else if (typ == IEND) d2 = true
          p += 8 + len + 4
        }
        inflater.setInput(idatBuf, 0, idatTotal)
      }
      var off = 0
      while (off < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, off, rawLen - off)
        if (n == 0 && !inflater.finished()) {
          // cover every zero-progress mode (preset-dictionary streams
          // report needsDictionary, not needsInput — the old check spun)
          if (inflater.needsDictionary())
            throw new IllegalArgumentException("IDAT requires a preset dictionary (unsupported)")
          if (inflater.needsInput()) throw new IllegalArgumentException("truncated IDAT")
          throw new IllegalArgumentException("IDAT stream stalled")
        }
        off += n
      }
      require(off == rawLen, s"IDAT inflated $off of $rawLen bytes")

      // unfilter scanline by scanline (PNG spec §6)
      var y = 0
      off = 0
      while (y < h) {
        val filter = raw(off) & 0xff
        off += 1
        System.arraycopy(raw, off, cur, 0, stride)
        off += stride
        filter match {
          case 0 => ()
          case 1 => // Sub
            var i = bpp
            while (i < stride) { cur(i) = (cur(i) + cur(i - bpp)).toByte; i += 1 }
          case 2 => // Up
            var i = 0
            while (i < stride) { cur(i) = (cur(i) + prev(i)).toByte; i += 1 }
          case 3 => // Average
            var i = 0
            while (i < stride) {
              val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
              val b = prev(i) & 0xff
              cur(i) = (cur(i) + ((a + b) >> 1)).toByte
              i += 1
            }
          case 4 => // Paeth
            var i = 0
            while (i < stride) {
              val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
              val b = prev(i) & 0xff
              val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              cur(i) = (cur(i) + pred).toByte
              i += 1
            }
          case f => throw new IllegalArgumentException(s"bad PNG filter $f")
        }
        var x = 0
        while (x < w) {
          val i = x * bpp
          pxBuf(y * w + x) = ((cur(i) & 0xff) << 16) | ((cur(i + 1) & 0xff) << 8) | (cur(i + 2) & 0xff)
          x += 1
        }
        val t = prev; prev = cur; cur = t // swap instead of copying
        y += 1
      }
    }
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
}
