package graft.tiles

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite with SparkTestBase {

  test("PCM16 round trip: decode(encode(x)) ≡ x up to quantization") {
    val samples = Array.tabulate(2048)(i => (math.sin(i * 0.05) * 0.8).toFloat)
    val bytes = Wav.encodePcm16(samples, 16000)
    assert(Wav.isWav(bytes))
    val audio = Wav.decode(bytes)
    assert(audio.sampleRate === 16000)
    assert(audio.samples.length === samples.length)
    samples.zip(audio.samples).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.5f / 32768f, s"quantization error $a vs $b") // round-to-32767 vs divide-by-32768 asymmetry
    }
  }

  test("corrupt WAV chunks: negative length and 0-channel fmt throw clear errors") {
    val good = Wav.encodePcm16(Array.tabulate(256)(i => (i / 256.0f)), 8000)
    // data chunk length lives at offset 40 in our canonical writer layout
    val negLen = good.clone()
    java.nio.ByteBuffer.wrap(negLen, 40, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-4)
    val e1 = intercept[IllegalArgumentException](Wav.decode(negLen))
    assert(e1.getMessage.contains("negative length"))
    // fmt chunk channel count (offset 22) = 0
    val zeroCh = good.clone()
    java.nio.ByteBuffer.wrap(zeroCh, 22, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(0)
    val e2 = intercept[IllegalArgumentException](Wav.decode(zeroCh))
    assert(e2.getMessage.contains("channels"))
  }

  test("zero crossings of a pure sine match 2·f·duration ground truth") {
    val rate = 16000
    val f = 440.0
    val n = rate // exactly 1 second
    val sine = Array.tabulate(n)(i => math.sin(2 * math.Pi * f * i / rate).toFloat)
    val bytes = Wav.encodePcm16(sine, rate)
    import spark.implicits._
    val df = Seq(("a", bytes)).toDF("media_id", "bytes")
    val row = Multimodal.audioFeatures(df, windows = 8).collect().head
    assert(row.getAs[Boolean]("real_decode"))
    assert(row.getAs[Int]("sample_rate") === rate)
    assert(row.getAs[Long]("n_samples") === n.toLong)
    val zc = row.getAs[Long]("zero_crossings")
    // a 440 Hz sine crosses zero 880 times/s; windowing loses ≤ windows edges
    assert(math.abs(zc - 880L) <= 10, s"zero crossings $zc")
    // RMS of a full-scale sine is 1/√2
    val rms = row.getSeq[Double](row.fieldIndex("rms_windows"))
    rms.foreach(v => assert(math.abs(v - 1 / math.sqrt(2)) < 0.02, s"rms $v"))
  }

  test("stereo PCM averages channels; 8-bit width decodes") {
    // hand-build a stereo 16-bit file: L = 0.5, R = -0.5 → mono 0.0
    val n = 64
    val buf = java.nio.ByteBuffer.allocate(44 + n * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + n * 4).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
    buf.put("data".getBytes).putInt(n * 4)
    (0 until n).foreach { _ => buf.putShort(16384).putShort(-16384) }
    val audio = Wav.decode(buf.array())
    assert(audio.samples.length === n)
    audio.samples.foreach(s => assert(math.abs(s) < 1e-6))

    val buf8 = java.nio.ByteBuffer.allocate(44 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf8.put("RIFF".getBytes).putInt(36 + 16).put("WAVE".getBytes)
    buf8.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    buf8.put("data".getBytes).putInt(16)
    (0 until 16).foreach(i => buf8.put((128 + i * 4).toByte))
    val a8 = Wav.decode(buf8.array())
    assert(a8.samples(0) === 0.0f)
    assert(math.abs(a8.samples(8) - 0.25f) < 1e-6)
  }

  test("non-PCM codec fails with a named error; non-WAV bytes use the labeled stub") {
    val bad = java.nio.ByteBuffer.allocate(60).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    bad.put("fmt ".getBytes).putInt(16).putShort(85 /* mp3 */).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(16)
    bad.put("data".getBytes).putInt(8)
    val e = intercept[IllegalArgumentException](Wav.decode(bad.array()))
    assert(e.getMessage.contains("85"))

    import spark.implicits._
    val df = Seq(("x", Array.tabulate[Byte](512)(_.toByte))).toDF("media_id", "bytes")
    val row = Multimodal.audioFeatures(df, windows = 4).collect().head
    assert(!row.getAs[Boolean]("real_decode"))
    assert(row.getAs[Int]("sample_rate") === 0)
  }

  test("synth fixtures are deterministic and decode as real WAV across a DataFrame") {
    import spark.implicits._
    assert(Wav.synth(7L).toSeq === Wav.synth(7L).toSeq)
    val media = spark.range(0, 50).map(i => (f"aud_$i%06d", Wav.synth(i))).toDF("media_id", "bytes")
    val feats = Multimodal.audioFeatures(media, windows = 8).cache()
    assert(feats.where(!col("real_decode")).count() === 0)
    assert(feats.where(col("n_samples") =!= 4096L).count() === 0)
    // different fundamental frequencies → different zero-crossing counts
    assert(feats.select("zero_crossings").distinct().count() > 10)
  }

  test("fmt declaring bits 1..7 raises a typed error, not a divide-by-zero") {
    val wav = Wav.encodePcm16(Array(0.1f, 0.2f), 8000)
    // bits_per_sample lives at fmt body offset 14 = absolute 34 (LE short)
    wav(34) = 4
    val e = intercept[IllegalArgumentException](Wav.decode(wav))
    assert(e.getMessage.contains("unsupported PCM width"))
  }
}
