package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operators over opaque binary payloads + typed
  * metadata (builder prompt: treat image/audio/video as binary columns;
  * implement decode / feature-extract / resize / frame-sample with real
  * Spark-side plumbing).
  *
  * Image decode/resize/feature-extract are REAL (the lock-free Png codec,
  * with a javax.imageio fallback for foreign formats). Audio is REAL for
  * RIFF/WAVE PCM payloads (graft.tiles.Wav — PCM needs no codec library);
  * compressed audio and video have no codec offline, so those paths run a
  * clearly-marked deterministic fake decoder over the bytes — the schema,
  * partitioning, batch shape and per-partition execution are the
  * production plumbing; only the inner `decodeFrame`/`decodeSamples` call
  * is the stub to swap for a codec library on a real cluster.
  */
object Multimodal {

  // --------------------------------------------------------------- images
  /** Decode + per-image features: width/height (validated vs metadata),
    * mean luminance, edge-ness proxy (mean abs horizontal gradient). */
  def imageFeatures(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "w", "h").map { r =>
      Images.withDecoded(r.getAs[Array[Byte]](1)) { img =>
      var lum = 0.0
      var grad = 0.0
      var n = 0L
      var y = 0
      while (y < img.h) {
        var x = 0
        var prev = 0.0
        while (x < img.w) {
          val rgb = img.rgb(x, y)
          val l = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          lum += l
          if (x > 0) grad += math.abs(l - prev)
          prev = l
          n += 1
          x += 1
        }
        y += 1
      }
      (r.getString(0), img.w, img.h,
        img.w == r.getInt(2) && img.h == r.getInt(3),
        lum / n, if (n > img.h) grad / (n - img.h) else 0.0)
      }
    }.toDF("image_id", "decoded_w", "decoded_h", "dims_ok", "mean_luma", "mean_grad")
  }

  /** Real resize (bilinear), re-encoded PNG. */
  def resize(images: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes").map { r =>
      val out = Images.withDecoded(r.getAs[Array[Byte]](1))(Images.resize(_, targetW, targetH))
      (r.getString(0), Images.encodePng(out), targetW, targetH, "png")
    }.toDF("image_id", "bytes", "w", "h", "fmt")
  }

  // --------------------------------------------------- audio/video (stub)
  /** STUB decoder: no audio codec offline. Deterministically derives
    * "samples" from the payload bytes so the pipeline shape (binary column
    * → fixed-length feature vector, batched per partition) is real and
    * testable; swap `fakeSamples` for a codec call in production. */
  private def fakeSamples(bytes: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    if (bytes.isEmpty) return out // zero-length payload → silence, not ÷0
    var i = 0
    while (i < n) {
      out(i) = ((bytes(i % bytes.length) & 0xff) - 128) / 128.0f
      i += 1
    }
    out
  }

  /** Audio feature extraction: (media_id, bytes) → per-window RMS energy +
    * zero crossings + sample metadata. RIFF/WAVE PCM payloads decode for
    * REAL (graft.tiles.Wav — PCM needs no codec library); anything else
    * falls through to the clearly-marked deterministic stub (`real_decode`
    * = false) whose inner call is the swap point for an mp3/aac codec. */
  def audioFeatures(media: DataFrame, windows: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val (samples, rate, real) =
        if (Wav.isWav(bytes)) {
          val a = Wav.decode(bytes)
          (a.samples, a.sampleRate, true)
        } else (fakeSamples(bytes, windows * 256), 0, false) // ??? real codec here
      val win = math.max(1, samples.length / windows)
      val rms = new Array[Double](windows)
      var zc = 0L
      var w = 0
      while (w < windows) {
        var acc = 0.0
        var i = 0
        val base = w * win
        while (i < win && base + i < samples.length) {
          val s = samples(base + i)
          acc += s * s
          if (i > 0 && (s >= 0) != (samples(base + i - 1) >= 0)) zc += 1
          i += 1
        }
        rms(w) = math.sqrt(acc / math.max(1, math.min(win, samples.length - base)))
        w += 1
      }
      (r.getString(0), rms.toSeq, zc, rate, samples.length.toLong, real)
    }.toDF("media_id", "rms_windows", "zero_crossings", "sample_rate", "n_samples", "real_decode")
  }

  /** Video frame sampling: (media_id, bytes) → every k-th frame reduced to
    * a 64-bit average-hash fingerprint. MPNG AVI payloads decode for REAL
    * (graft.tiles.Avi container walk + the lock-free Png codec; only the
    * sampled frames are decoded — the container walk reads chunk headers,
    * never frame bodies). Other containers fall through to the
    * clearly-marked stub (`real_decode` = false), the swap point for an
    * H.264-class codec library. */
  def videoFrameSample(media: DataFrame, everyK: Int = 10, frames: Int = 100): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      if (Avi.isAvi(bytes)) {
        val ptrs = Avi.framePointers(bytes)
        val sampled = ptrs.indices.by(everyK).take(frames).map { f =>
          (f, Images.aHash(Avi.decodeFrame(bytes, ptrs(f))))
        }
        (r.getString(0), sampled.map(_._1), sampled.map(_._2), true)
      } else {
        val sampled = (0 until frames by everyK).map { f =>
          // ??? real frame decode here; stub = rolling hash over a byte slice
          var h = 1469598103934665603L ^ f
          if (bytes.nonEmpty) { // zero-length payload → seed hash, not ÷0
            var i = 0
            while (i < 64) {
              h ^= bytes((f * 64 + i) % bytes.length) & 0xffL
              h *= 1099511628211L
              i += 1
            }
          }
          (f, h)
        }
        (r.getString(0), sampled.map(_._1), sampled.map(_._2), false)
      }
    }.toDF("media_id", "frame_idx", "frame_hash", "real_decode")
  }
}
