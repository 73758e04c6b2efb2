package graft.tiles

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Deterministic image+caption table (BASELINE.json input_hint schema:
  * image_id, bytes, w, h, fmt, caption, phash) — FIXTURES.md §C.
  *
  * Pixel formula: `pixel(x,y) channel c = (x*31 + y*17 + idx*7 + c*13) % 256`,
  * PNG-encoded (lossless, so the PSNR≥40dB parity gate is exact pixel
  * equality; SURVEY.md §7.4 risk 4). Every image gets a deterministic
  * lon/lat derived from its index, biased toward OsmWorld cluster centers
  * so the point side of PIP/kNN joins has the hot-cell skew the north rule
  * demands. phash = 64-bit average-hash of the 8×8 grayscale downsample.
  */
object Images {

  def pixelValue(x: Int, y: Int, idx: Long, channel: Int): Int =
    (((x * 31 + y * 17 + channel * 13).toLong + idx * 7) % 256).toInt.abs

  def synthPixels(w: Int, h: Int, idx: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = pixelValue(x, y, idx, 0)
        val g = pixelValue(x, y, idx, 1)
        val b = pixelValue(x, y, idx, 2)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** 64-bit average hash: 8×8 grayscale downsample, bit i set iff
    * pixel_i > mean. */
  def aHash(img: BufferedImage): Long = {
    val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g2 = small.createGraphics()
    g2.drawImage(img, 0, 0, 8, 8, null)
    g2.dispose()
    val gray = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      val v = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      gray(i) = v
      sum += v
      i += 1
    }
    val mean = sum / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (gray(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** PSNR between two images in dB; Double.PositiveInfinity when identical.
    * The input_hint parity gate: PSNR ≥ 40 dB (lossy) / exact (lossless). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    var se = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y)
        val pb = b.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val d = (((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)).toDouble
          se += d * d
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val mse = se / (a.getWidth.toLong * a.getHeight * 3)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** Deterministic geo-position for image `idx`: biased to cluster centers
    * (80% clustered with gaussian-ish jitter, 20% uniform background). The
    * same arithmetic is reproducible in plain SQL for the oracle. */
  def position(idx: Long, centers: Seq[(Double, Double)]): (Double, Double) = {
    val h = idx * 2654435761L % 1000003L
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

  def synthRow(idx: Long, centers: Seq[(Double, Double)]): ImageRow = {
    val dims = Array(16, 32, 64)
    val w = dims((idx % 3).toInt)
    val h = dims(((idx / 3) % 3).toInt)
    val img = synthPixels(w, h, idx)
    val (lon, lat) = position(idx, centers)
    ImageRow(f"img_$idx%09d", encodePng(img), w, h, "png",
      f"caption for img_$idx%09d tile ${lon.toInt}_${lat.toInt}", aHash(img), lon, lat)
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
