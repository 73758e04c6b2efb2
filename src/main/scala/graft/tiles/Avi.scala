package graft.tiles

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal AVI (RIFF) container codec for MPNG video streams — PNG-encoded
  * frames in standard '00dc' chunks (public AVI/RIFF spec; 'MPNG' is the
  * registered motion-PNG fourcc). Together with graft.tiles.Png this makes
  * `Multimodal.videoFrameSample` REAL end-to-end with zero external codec
  * libraries: real container walking, real per-frame image decode. The
  * stub remains only for codecs that genuinely need absent libraries
  * (H.264 etc.).
  */
object Avi {

  def isAvi(b: Array[Byte]): Boolean =
    b.length > 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Build an AVI holding the given PNG-encoded frames as one MPNG video
    * stream (w/h must match the frames). */
  def encode(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 10): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val padded = body.length + (body.length & 1)
      val out = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0x10 /* HASINDEX off, KEYFRAMES */)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MPNG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // scale, rate → fps
      .putInt(0).putInt(frames.size).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put("MPNG".getBytes("US-ASCII")).putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)

    val hdrl = list("hdrl",
      chunk("avih", avih.array()) ++ list("strl",
        chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Offsets+lengths of the video frame chunks ('00dc'/'00db') in stream
    * order — cheap container walk, no frame is decoded. */
  def framePointers(bytes: Array[Byte]): Vector[(Int, Int)] = {
    require(isAvi(bytes), "not a RIFF/AVI payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Vector.newBuilder[(Int, Int)]
    def walk(pos0: Int, end: Int): Unit = {
      var pos = pos0
      while (pos + 8 <= end) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // a negative (or overflowing) signed chunk length would stall or
        // reverse the walk — an executor task spinning forever is worse
        // than the decode failure it replaces
        if (len < 0)
          throw new IllegalArgumentException(s"corrupt RIFF chunk $id: negative length $len")
        val body = pos + 8
        if (body + len > end) return // truncated tail tolerated
        if (id == "LIST") walk(body + 4, body + len)
        else if (id == "00dc" || id == "00db") out += ((body, len))
        val next = body + len + (len & 1)
        if (next <= pos)
          throw new IllegalArgumentException(s"corrupt RIFF chunk $id: walk did not advance at $pos")
        pos = next
      }
    }
    walk(12, bytes.length)
    out.result()
  }

  /** Decode frame `i` (PNG payload) of an MPNG AVI. */
  def decodeFrame(bytes: Array[Byte], ptr: (Int, Int)): Img =
    Png.decode(java.util.Arrays.copyOfRange(bytes, ptr._1, ptr._1 + ptr._2))

  /** Deterministic video fixture: `nFrames` synthetic frames whose pixel
    * pattern shifts per frame (idx ⊕ frame drives the generator). */
  def synth(idx: Long, nFrames: Int = 30, w: Int = 16, h: Int = 16): Array[Byte] =
    encode((0 until nFrames).map(f =>
      Png.encode(Images.synthPixels(w, h, idx * 1000 + f))), w, h)
}
