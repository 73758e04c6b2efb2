package graft.osmpbf.codec

import java.nio.charset.StandardCharsets

/** Minimal protobuf wire-format reader/writer, hand-rolled because no
  * protobuf-java jar is guaranteed on the offline classpath (SURVEY.md §7.0).
  *
  * Wire types: 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
  * Packed repeated scalars are wire type 2 with concatenated varints; the
  * readers below accept both packed and unpacked encodings.
  *
  * Semantics follow the public protobuf encoding spec; the OSMPBF message
  * shapes this feeds are the public OSMPBF schema the reference mirrors
  * (reference structs under /root/reference/src/blocks/).
  */
object Proto {
  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireLen = 2
  final val WireFixed32 = 5

  @inline def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)
}

/** Growable primitive long buffer (decode hot path, no boxing). */
final class LongBuf(initial: Int = 16) {
  private var arr = new Array[Long](initial)
  private var n = 0
  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v; n += 1
  }
  def length: Int = n
  def apply(i: Int): Long = arr(i)
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)
  /** In-place prefix sum (delta decode). Returns this. */
  def prefixSum(): LongBuf = {
    var i = 1
    while (i < n) { arr(i) += arr(i - 1); i += 1 }
    this
  }
  def clear(): Unit = n = 0
}

final class IntBuf(initial: Int = 16) {
  private var arr = new Array[Int](initial)
  private var n = 0
  def add(v: Int): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v; n += 1
  }
  def length: Int = n
  def apply(i: Int): Int = arr(i)
  def toArray: Array[Int] = java.util.Arrays.copyOf(arr, n)
}

/** Cursor over a byte range holding one protobuf message. */
final class ProtoReader(val buf: Array[Byte], start: Int, val end: Int) {
  var pos: Int = start

  def hasNext: Boolean = pos < end

  def fail(msg: String): Nothing =
    throw new PbfParseException(s"$msg at byte $pos (range $start..$end)")

  def readVarint(): Long = {
    var shift = 0
    var result = 0L
    while (shift < 64) {
      if (pos >= end) fail("varint overruns buffer")
      val b = buf(pos)
      pos += 1
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    fail("varint too long")
  }

  def readSint(): Long = Proto.zigzagDecode(readVarint())

  /** Returns (field, wire) packed as field<<3|wire; 0 when exhausted. */
  def readTag(): Int = {
    if (pos >= end) 0 else {
      val t = readVarint()
      if (t <= 0 || t > Int.MaxValue) fail(s"bad tag $t")
      t.toInt
    }
  }

  def readLenRange(): (Int, Int) = {
    val len = readVarint()
    if (len < 0 || pos + len > end) fail(s"length $len overruns buffer")
    val s = pos
    pos += len.toInt
    (s, s + len.toInt)
  }

  def readBytes(): Array[Byte] = {
    val (s, e) = readLenRange()
    java.util.Arrays.copyOfRange(buf, s, e)
  }

  def readString(): String = {
    val (s, e) = readLenRange()
    new String(buf, s, e - s, StandardCharsets.UTF_8)
  }

  def subReader(): ProtoReader = {
    val (s, e) = readLenRange()
    new ProtoReader(buf, s, e)
  }

  def skip(wire: Int): Unit = wire match {
    case Proto.WireVarint => readVarint()
    case Proto.WireFixed64 => pos += 8
    case Proto.WireLen => readLenRange()
    case Proto.WireFixed32 => pos += 4
    case w => fail(s"unknown wire type $w")
  }

  /** Read a packed (wire 2) or single unpacked (wire 0) varint field into out. */
  def readPackedVarints(wire: Int, out: LongBuf): Unit = wire match {
    case Proto.WireLen =>
      val (s, e) = readLenRange()
      val sub = new ProtoReader(buf, s, e)
      while (sub.hasNext) out.add(sub.readVarint())
    case Proto.WireVarint => out.add(readVarint())
    case w => fail(s"packed field with wire $w")
  }

  def readPackedSints(wire: Int, out: LongBuf): Unit = wire match {
    case Proto.WireLen =>
      val (s, e) = readLenRange()
      val sub = new ProtoReader(buf, s, e)
      while (sub.hasNext) out.add(sub.readSint())
    case Proto.WireVarint => out.add(readSint())
    case w => fail(s"packed field with wire $w")
  }
}

class PbfParseException(msg: String) extends RuntimeException(msg)

/** Append-only protobuf message writer. */
final class ProtoWriter {
  private val out = new java.io.ByteArrayOutputStream(256)

  def size: Int = out.size()
  def toBytes: Array[Byte] = out.toByteArray

  def writeRawVarint(v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  private def tag(field: Int, wire: Int): Unit = writeRawVarint((field << 3) | wire)

  def varint(field: Int, v: Long): Unit = { tag(field, Proto.WireVarint); writeRawVarint(v) }
  def sint(field: Int, v: Long): Unit = varint(field, Proto.zigzagEncode(v))
  def bool(field: Int, v: Boolean): Unit = varint(field, if (v) 1 else 0)

  def bytes(field: Int, v: Array[Byte]): Unit = {
    tag(field, Proto.WireLen); writeRawVarint(v.length.toLong); out.write(v, 0, v.length)
  }
  def string(field: Int, v: String): Unit = bytes(field, v.getBytes(StandardCharsets.UTF_8))
  def message(field: Int, m: ProtoWriter): Unit = bytes(field, m.toBytes)

  def packedVarints(field: Int, vs: Iterable[Long]): Unit = if (vs.nonEmpty) {
    val p = new ProtoWriter
    vs.foreach(p.writeRawVarint)
    bytes(field, p.toBytes)
  }
  def packedSints(field: Int, vs: Iterable[Long]): Unit =
    packedVarints(field, vs.map(Proto.zigzagEncode))
  /** Delta-encode then zigzag-pack (DenseNodes/refs/memids semantics,
    * reference: dense_nodes.rs:7-24, way.rs:21-23). */
  def packedDeltaSints(field: Int, vs: Iterable[Long]): Unit = {
    var prev = 0L
    val deltas = vs.map { v => val d = v - prev; prev = v; d }
    packedSints(field, deltas)
  }
}
