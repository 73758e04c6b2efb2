package graft.tiles

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic image+caption table (BASELINE.json input_hint schema:
  * image_id, bytes, w, h, fmt, caption, phash) — FIXTURES.md §C.
  *
  * Pixel formula: `pixel(x,y) channel c = (x*31 + y*17 + idx*7 + c*13) % 256`,
  * PNG-encoded via the lock-free Png codec (lossless, so the PSNR≥40dB
  * parity gate is exact pixel equality; SURVEY.md §7.4 risk 4). Every image
  * gets a deterministic lon/lat derived from its index, biased toward
  * OsmWorld cluster centers so the point side of PIP/kNN joins has the
  * hot-cell skew the north rule demands. phash = 64-bit average-hash of the
  * 8×8 box-downsampled grayscale.
  */
object Images {

  def pixelValue(x: Int, y: Int, idx: Long, channel: Int): Int =
    (((x * 31 + y * 17 + channel * 13).toLong + idx * 7) % 256).toInt.abs

  def synthPixels(w: Int, h: Int, idx: Long): Img = {
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = pixelValue(x, y, idx, 0)
        val g = pixelValue(x, y, idx, 1)
        val b = pixelValue(x, y, idx, 2)
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Img(w, h, px)
  }

  def encodePng(img: Img): Array[Byte] = Png.encode(img)

  /** Decode image bytes: our codec for PNG, javax.imageio fallback for any
    * other format (note: ImageIO serializes at high thread counts — fine
    * for the rare fallback, never for the hot path). */
  def decode(bytes: Array[Byte]): Img = {
    if (Png.isPng(bytes)) Png.decode(bytes)
    else {
      val b = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val px = new Array[Int](b.getWidth * b.getHeight)
      b.getRGB(0, 0, b.getWidth, b.getHeight, px, 0, b.getWidth)
      Img(b.getWidth, b.getHeight, px.map(_ & 0xffffff))
    }
  }

  /** 64-bit average hash: 8×8 integer box-downsample of the grayscale,
    * bit i set iff cell mean > global mean. */
  def aHash(img: Img): Long = {
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < img.h) {
      val cy = math.min(7, y * 8 / img.h)
      var x = 0
      while (x < img.w) {
        val cx = math.min(7, x * 8 / img.w)
        val p = img.rgb(x, y)
        val gray = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        cells(cy * 8 + cx) += gray
        counts(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) {
      cells(i) = if (counts(i) > 0) cells(i) / counts(i) else 0L
      total += cells(i)
      i += 1
    }
    val mean = total / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Parity verdict for one encoded image vs the deterministic generator:
    * PSNR and average-hash computed in ONE fused pass over a per-thread
    * reused decode buffer (no Img, no second raster, no per-image native
    * Inflater). This is the scaling-critical hot path: at bench scale the
    * allocation rate of the naive decode→psnr→aHash pipeline made young-gen
    * GC the serial term that capped N→4N efficiency. Bit-identical to
    * `psnrVsSynth(decode(b), idx)` / `aHash(decode(b))` (asserted in
    * ImagesSpec). */
  final case class ParityStats(psnrDb: Double, ahash: Long, w: Int, h: Int)

  private val localDecoder = new ThreadLocal[Png.Decoder] {
    override def initialValue(): Png.Decoder = new Png.Decoder()
  }

  /** Run `f` over the decoded raster through the per-thread reused decoder
    * — zero per-image buffer/Inflater allocation for PNG payloads (the
    * pattern every per-row image op should use in a hot loop). The raster
    * view passed to `f` is only valid during the call. */
  def withDecoded[T](bytes: Array[Byte])(f: Img => T): T =
    if (Png.isPng(bytes)) {
      val d = localDecoder.get()
      d.decode(bytes)
      f(Img(d.w, d.h, d.px)) // view over the reused buffer (may be longer than w*h)
    } else f(decode(bytes))

  def parityStats(bytes: Array[Byte], idx: Long): ParityStats = {
    if (!Png.isPng(bytes)) { // foreign-format fallback (rare, never the hot path)
      val img = decode(bytes)
      return ParityStats(psnrVsSynth(img, idx), aHash(img), img.w, img.h)
    }
    val d = localDecoder.get()
    d.decode(bytes)
    val w = d.w
    val h = d.h
    val px = d.px
    val idxTerm = ((idx * 7) % 256).toInt // pixelValue's idx term, int math
    var se = 0.0
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      val yTerm = y * 17 + idxTerm
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val r = (p >> 16) & 0xff
        val g = (p >> 8) & 0xff
        val b = p & 0xff
        val base = x * 31 + yTerm
        var dd = (r - base % 256).toDouble; se += dd * dd
        dd = (g - (base + 13) % 256).toDouble; se += dd * dd
        dd = (b - (base + 26) % 256).toDouble; se += dd * dd
        val cx = math.min(7, x * 8 / w)
        cells(cy * 8 + cx) += (r + g + b) / 3
        counts(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) {
      cells(i) = if (counts(i) > 0) cells(i) / counts(i) else 0L
      total += cells(i)
      i += 1
    }
    val mean = total / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= (1L << i)
      i += 1
    }
    val mse = se / (w.toLong * h * 3)
    val psnr =
      if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
    ParityStats(psnr, hash, w, h)
  }

  /** PSNR of a decoded image against the deterministic generator formula —
    * allocation-free (no second image materialized): the hot path of the
    * parity gate at benchmark scale. */
  def psnrVsSynth(img: Img, idx: Long): Double = {
    var se = 0.0
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        val p = img.rgb(x, y)
        var c = 0
        while (c < 3) {
          val d = (((p >> (8 * (2 - c))) & 0xff) - pixelValue(x, y, idx, c)).toDouble
          se += d * d
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val mse = se / (img.px.length.toLong * 3)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** PSNR between two images in dB; Double.PositiveInfinity when identical.
    * The input_hint parity gate: PSNR ≥ 40 dB (lossy) / exact (lossless). */
  def psnr(a: Img, b: Img): Double = {
    require(a.w == b.w && a.h == b.h, "size mismatch")
    var se = 0.0
    var i = 0
    val n = a.px.length
    while (i < n) {
      val pa = a.px(i)
      val pb = b.px(i)
      var c = 0
      while (c < 3) {
        val d = (((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)).toDouble
        se += d * d
        c += 1
      }
      i += 1
    }
    val mse = se / (n.toLong * 3)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** Bilinear resize (lock-free; Multimodal's real image op). */
  def resize(img: Img, tw: Int, th: Int): Img = {
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y + 0.5) * img.h / th - 0.5
      val y0 = math.max(0, math.min(img.h - 1, sy.toInt))
      val y1 = math.min(img.h - 1, y0 + 1)
      val fy = sy - y0
      var x = 0
      while (x < tw) {
        val sx = (x + 0.5) * img.w / tw - 0.5
        val x0 = math.max(0, math.min(img.w - 1, sx.toInt))
        val x1 = math.min(img.w - 1, x0 + 1)
        val fx = sx - x0
        var outPx = 0
        var c = 0
        while (c < 3) {
          val sh = 8 * c
          val p00 = (img.rgb(x0, y0) >> sh) & 0xff
          val p10 = (img.rgb(x1, y0) >> sh) & 0xff
          val p01 = (img.rgb(x0, y1) >> sh) & 0xff
          val p11 = (img.rgb(x1, y1) >> sh) & 0xff
          val v = ((p00 * (1 - fx) + p10 * fx) * (1 - fy) +
            (p01 * (1 - fx) + p11 * fx) * fy).toInt
          outPx |= (math.max(0, math.min(255, v)) << sh)
          c += 1
        }
        out(y * tw + x) = outPx
        x += 1
      }
      y += 1
    }
    Img(tw, th, out)
  }

  /** Deterministic geo-position for image `idx`: biased to cluster centers
    * (80% clustered with jitter, 20% uniform background). */
  def position(idx: Long, centers: Seq[(Double, Double)]): (Double, Double) = {
    // mask the sign bit BEFORE the mod: idx * K wraps negative past
    // idx ≈ 3.47e9 (this generator claims 10^12 scale), and a negative h
    // indexes centers out of bounds; positive products are unchanged, so
    // every existing fixture keeps its coordinates
    val h = ((idx * 2654435761L) & Long.MaxValue) % 1000003L
    if (h % 5 < 4 && centers.nonEmpty) {
      val c = centers(((h / 5) % centers.size).toInt)
      val jLon = ((h % 997).toDouble / 997.0 - 0.5) * 0.3
      val jLat = (((h / 997) % 991).toDouble / 991.0 - 0.5) * 0.3
      (c._1 + jLon, c._2 + jLat)
    } else {
      val lon = (h % 3600).toDouble / 10.0 - 180.0
      val lat = ((h / 3600) % 1600).toDouble / 10.0 - 80.0
      (lon, lat)
    }
  }

  final case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
      fmt: String, caption: String, phash: Long, lon: Double, lat: Double)

  /** `img_%09d` without java.util.Formatter (which re-parses the format
    * string and allocates per call — measurable at millions of rows). */
  def idString(idx: Long): String = {
    val digits = idx.toString
    val sb = new java.lang.StringBuilder(4 + math.max(9, digits.length))
    sb.append("img_")
    var pad = 9 - digits.length
    while (pad > 0) { sb.append('0'); pad -= 1 }
    sb.append(digits).toString
  }

  def captionFor(idx: Long, lon: Double, lat: Double): String = {
    val sb = new java.lang.StringBuilder(48)
    sb.append("caption for ").append(idString(idx))
      .append(" tile ").append(lon.toInt).append('_').append(lat.toInt)
    sb.toString
  }

  def synthRow(idx: Long, centers: Seq[(Double, Double)]): ImageRow = {
    val dims = Array(16, 32, 64)
    val w = dims((idx % 3).toInt)
    val h = dims(((idx / 3) % 3).toInt)
    val img = synthPixels(w, h, idx)
    val (lon, lat) = position(idx, centers)
    ImageRow(idString(idx), encodePng(img), w, h, "png",
      captionFor(idx, lon, lat), aHash(img), lon, lat)
  }

  /** Distributed synthesis of the image table as a Dataset — generation is
    * per-index deterministic, so executors build their ranges independently
    * (no driver materialization; scales linearly with cores). */
  def synthesize(spark: SparkSession, n: Long,
      centers: Seq[(Double, Double)], partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val centersB = spark.sparkContext.broadcast(centers)
    spark.range(0, n, 1, partitions)
      .mapPartitions(_.map(idx => synthRow(idx, centersB.value)))
      .toDF()
  }
}
