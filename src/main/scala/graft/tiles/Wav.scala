package graft.tiles

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE PCM codec (public WAVE spec; PCM needs no codec
  * library). Supports 8- and 16-bit PCM at any channel count — channels
  * average to mono on decode. This makes `Multimodal.audioFeatures` REAL
  * end-to-end for WAV payloads; the deterministic stub remains only for
  * compressed formats (mp3/aac), whose codecs don't exist offline.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Float])

  def isWav(b: Array[Byte]): Boolean =
    b.length > 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def encodePcm16(samples: Array[Float], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      buf.putShort(math.max(-32768, math.min(32767, math.round(samples(i) * 32767f))).toShort)
      i += 1
    }
    buf.array()
  }

  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a RIFF/WAVE payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = -1
    var rate = -1
    var bits = -1
    var samples: Array[Float] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      // negative lengths pass the truncation check below and stall the walk
      if (len < 0)
        throw new IllegalArgumentException(s"corrupt WAV chunk $id: negative length $len")
      val body = pos + 8
      if (body + len > bytes.length)
        throw new IllegalArgumentException(s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          val audioFormat = buf.getShort(body) & 0xffff
          if (audioFormat != 1)
            throw new IllegalArgumentException(
              s"unsupported WAV codec $audioFormat (this build decodes PCM only)")
          channels = buf.getShort(body + 2) & 0xffff
          rate = buf.getInt(body + 4)
          bits = buf.getShort(body + 14) & 0xffff
        case "data" =>
          require(bits > 0, "WAV data chunk before fmt chunk")
          require(channels > 0, s"WAV fmt chunk declares $channels channels")
          // validate the width BEFORE the frame division: bits in 1..7
          // would make bytesPer 0 and divide by zero below
          if (bits != 8 && bits != 16)
            throw new IllegalArgumentException(s"unsupported PCM width $bits")
          val bytesPer = bits / 8
          val frames = len / (bytesPer * channels)
          val out = new Array[Float](frames)
          var f = 0
          while (f < frames) {
            var acc = 0.0f
            var c = 0
            while (c < channels) {
              val off = body + (f * channels + c) * bytesPer
              acc += (bits match {
                case 16 => buf.getShort(off) / 32768.0f
                case 8 => ((bytes(off) & 0xff) - 128) / 128.0f
                case b => throw new IllegalArgumentException(s"unsupported PCM width $b")
              })
              c += 1
            }
            out(f) = acc / channels
            f += 1
          }
          samples = out
        case _ => () // LIST/INFO etc. skipped
      }
      pos = body + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(samples != null, "WAV has no data chunk")
    Audio(rate, samples)
  }

  /** Deterministic audio fixture: two sines + seeded low-level noise —
    * spectral content is known, so feature tests have ground truth. */
  def synth(idx: Long, nSamples: Int = 4096, sampleRate: Int = 16000): Array[Byte] = {
    val f1 = 110.0 + (idx % 40) * 55.0
    val f2 = 330.0 + ((idx / 7) % 20) * 110.0
    val samples = new Array[Float](nSamples)
    var i = 0
    while (i < nSamples) {
      val t = i.toDouble / sampleRate
      val noise = (((idx * 6364136223846793005L + i * 1442695040888963407L) >>> 40).toInt % 1000) / 50000.0
      samples(i) = (0.5 * math.sin(2 * math.Pi * f1 * t) +
        0.3 * math.sin(2 * math.Pi * f2 * t) + noise).toFloat
      i += 1
    }
    encodePcm16(samples, sampleRate)
  }
}
