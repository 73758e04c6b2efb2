package graft.osmpbf.codec

import graft.osmpbf.model._

import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

/** OSMPBF blob + block codec.
  *
  * Implements the five-step decode the reference only sketches
  * (reference: src/io/reader.rs:322-332 — "decompress → parse PrimitiveBlock
  * → extract from PrimitiveGroups → handle DenseNodes → resolve string
  * table"), against the public OSMPBF schema the reference's structs mirror
  * (src/blocks/). All wire parsing is hand-rolled varint (Proto.scala);
  * no protobuf jar needed.
  *
  * Size limits follow the reference: BlobHeader ≤ 64 KiB, uncompressed
  * message ≤ 32 MiB (src/blocks/blob.rs:5-9, enforcement :91-99, :152-161).
  */
object PbfCodec {
  final val MaxHeaderSize = 64 * 1024
  final val MaxMessageSize = 32 * 1024 * 1024

  final val KindNode = 1
  final val KindWay = 2
  final val KindRelation = 4
  final val KindChangeSet = 8
  final val KindAll = 15

  // ---------------------------------------------------------------- zlib
  def inflate(data: Array[Byte], from: Int, len: Int, rawSize: Int): Array[Byte] = {
    if (rawSize < 0 || rawSize > MaxMessageSize)
      throw new PbfParseException(s"uncompressed size $rawSize exceeds 32MiB cap")
    val inf = new Inflater()
    try {
      inf.setInput(data, from, len)
      val out = new Array[Byte](rawSize)
      var off = 0
      while (off < rawSize && !inf.finished()) {
        val n = inf.inflate(out, off, rawSize - off)
        if (n == 0 && !inf.finished()) {
          // cover EVERY zero-progress mode: a stream demanding a preset
          // dictionary (FDICT) reports needsDictionary, not needsInput —
          // checking only needsInput spun this loop forever
          if (inf.needsDictionary())
            throw new PbfParseException("zlib stream requires a preset dictionary (unsupported)")
          if (inf.needsInput())
            throw new PbfParseException("truncated zlib stream")
          throw new PbfParseException("zlib stream stalled")
        }
        off += n
      }
      if (off != rawSize)
        throw new PbfParseException(s"zlib inflated $off bytes, expected $rawSize")
      out
    } catch {
      // corrupt deflate bits must surface as the typed parse error every
      // permissive/stats caller already handles, same as the unsized path
      case e: java.util.zip.DataFormatException =>
        throw new PbfParseException(s"zlib decode failed: ${e.getMessage}")
    } finally inf.end()
  }

  /** Inflate with no declared raw_size: explicit Inflater loop with the
    * same zero-progress discipline as [[inflate]]. The previous
    * InflaterInputStream drain returned EOF (-1) when the inflater
    * `needsDictionary` — an FDICT stream without raw_size silently yielded
    * a truncated (even empty, which still parses as a valid empty block)
    * payload instead of the fail-fast the sized path has. */
  def inflateUnsized(data: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data, from, len)
      val out = new java.io.ByteArrayOutputStream(64 * 1024)
      val chunk = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n = inf.inflate(chunk)
        if (n == 0 && !inf.finished()) {
          if (inf.needsDictionary())
            throw new PbfParseException("zlib stream requires a preset dictionary (unsupported)")
          if (inf.needsInput())
            throw new PbfParseException("truncated zlib stream")
          throw new PbfParseException("zlib stream stalled")
        }
        out.write(chunk, 0, n)
        if (out.size() > MaxMessageSize)
          throw new PbfParseException("zlib payload exceeds 32MiB cap")
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new PbfParseException(s"zlib decode failed: ${e.getMessage}")
    } finally inf.end()
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  // ------------------------------------------------------ BlobHeader / Blob
  /** Parsed BlobHeader: (type, datasize, ok). */
  final case class BlobHeaderMsg(blobType: String, datasize: Int)

  /** Strict parse of a BlobHeader message occupying exactly [from, to). */
  def parseBlobHeader(buf: Array[Byte], from: Int, to: Int): BlobHeaderMsg = {
    val r = new ProtoReader(buf, from, to)
    var tpe: String = null
    var datasize = -1
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => tpe = r.readString()
        case 3 => datasize = r.readVarint().toInt
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    if (tpe == null || datasize < 0) throw new PbfParseException("incomplete BlobHeader")
    BlobHeaderMsg(tpe, datasize)
  }

  /** Blob message → uncompressed payload bytes (raw or zlib). */
  def decodeBlobPayload(buf: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val r = new ProtoReader(buf, from, to)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlibFrom = -1
    var zlibLen = -1
    var zstdFrom = -1
    var zstdLen = -1
    var lzmaFrom = -1
    var lzmaLen = -1
    var bzip2From = -1
    var bzip2Len = -1
    var lz4From = -1
    var lz4Len = -1
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => raw = r.readBytes()
        case 2 => rawSize = r.readVarint().toInt
        case 3 =>
          val (s, e) = r.readLenRange(); zlibFrom = s; zlibLen = e - s
        // every codec the OSMPBF spec declares (blob.rs:114-133 lists the
        // fields "for future use" but the reference decodes none of them):
        // lzma via org.tukaani.xz, bzip2 via commons-compress, lz4 (standard
        // frame format — the only public interchange framing) via lz4-java,
        // zstd via zstd-jni — all four libraries ship with Spark at
        // /opt/spark/jars
        case 4 =>
          val (s, e) = r.readLenRange(); lzmaFrom = s; lzmaLen = e - s
        case 5 =>
          val (s, e) = r.readLenRange(); bzip2From = s; bzip2Len = e - s
        case 6 =>
          val (s, e) = r.readLenRange(); lz4From = s; lz4Len = e - s
        case 7 =>
          val (s, e) = r.readLenRange(); zstdFrom = s; zstdLen = e - s
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    if (raw != null) {
      if (raw.length > MaxMessageSize)
        throw new PbfParseException(s"raw payload ${raw.length} exceeds 32MiB cap")
      raw
    } else if (zlibFrom >= 0) {
      // raw_size is optional in the spec: with it, one exact-size inflate;
      // without it, stream-drain with the shared 32 MiB cap (the old path
      // demanded the inflated size EQUAL the 32 MiB cap — every spec-legal
      // foreign blob omitting raw_size was unreadable)
      if (rawSize >= 0) inflate(buf, zlibFrom, zlibLen, rawSize)
      else inflateUnsized(buf, zlibFrom, zlibLen)
    } else if (zstdFrom >= 0) {
      unzstd(buf, zstdFrom, zstdLen, rawSize)
    } else if (lzmaFrom >= 0) {
      // memlimit is KiB: 64 MiB bounds a hostile header's dictionary demand
      drainStream("lzma", new org.tukaani.xz.LZMAInputStream(
        new java.io.ByteArrayInputStream(buf, lzmaFrom, lzmaLen), 64 * 1024), rawSize)
    } else if (bzip2From >= 0) {
      drainStream("bzip2",
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(buf, bzip2From, bzip2Len)), rawSize)
    } else if (lz4From >= 0) {
      drainStream("lz4", new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(buf, lz4From, lz4Len)), rawSize)
    } else throw new PbfParseException("Blob has neither raw nor zlib_data")
  }

  /** Stream-codec decode (lzma/bzip2) with the same 32 MiB discipline as the
    * block codecs: sized exactly by raw_size when declared, otherwise read
    * in bounded chunks and capped. The stream is constructed INSIDE the try
    * — both codecs' constructors parse headers and throw IOException on
    * corrupt input, which must surface as a typed PbfParseException. */
  private def drainStream(codec: String, mkIn: => java.io.InputStream,
      rawSize: Int): Array[Byte] = {
    var in: java.io.InputStream = null
    try {
      if (rawSize > MaxMessageSize)
        throw new PbfParseException(s"$codec raw_size $rawSize exceeds 32MiB cap")
      in = mkIn
      val out = new java.io.ByteArrayOutputStream(if (rawSize >= 0) rawSize else 64 * 1024)
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n > 0) {
        out.write(chunk, 0, n)
        if (out.size() > MaxMessageSize)
          throw new PbfParseException(s"$codec payload exceeds 32MiB cap")
        n = in.read(chunk)
      }
      val bytes = out.toByteArray
      if (rawSize >= 0 && bytes.length != rawSize)
        throw new PbfParseException(
          s"$codec payload decoded ${bytes.length} bytes, declared $rawSize")
      bytes
    } catch {
      case e: java.io.IOException =>
        throw new PbfParseException(s"$codec decode failed: ${e.getMessage}")
    } finally if (in != null) in.close()
  }

  /** zstd_data (Blob field 7) → bytes via zstd-jni (ships with Spark). The
    * OSMPBF spec makes raw_size optional; when absent, the frame header's
    * declared content size is used, capped at 32 MiB either way. */
  private def unzstd(buf: Array[Byte], from: Int, len: Int, rawSize: Int): Array[Byte] = {
    val frame = java.util.Arrays.copyOfRange(buf, from, from + len)
    val size =
      if (rawSize >= 0) rawSize.toLong
      else com.github.luben.zstd.Zstd.getFrameContentSize(frame)
    if (size < 0)
      // legal per spec: a streaming-API frame omits the content size and
      // raw_size is optional — decode chunked under the same 32 MiB cap
      return drainStream("zstd", new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(frame)), rawSize)
    if (size > MaxMessageSize)
      throw new PbfParseException(s"zstd payload size $size exceeds 32MiB cap")
    val out = new Array[Byte](size.toInt)
    val n =
      try com.github.luben.zstd.Zstd.decompress(out, frame)
      catch {
        case e: com.github.luben.zstd.ZstdException =>
          throw new PbfParseException(s"zstd decode failed: ${e.getMessage}")
      }
    if (n != size)
      throw new PbfParseException(s"zstd payload decoded $n bytes, declared $size")
    out
  }

  // ------------------------------------------------------------ HeaderBlock
  def parseHeaderBlock(buf: Array[Byte]): HeaderMeta = {
    val r = new ProtoReader(buf, 0, buf.length)
    val req = Seq.newBuilder[String]
    val opt = Seq.newBuilder[String]
    var wp = ""
    var src = ""
    var bbox: Option[HeaderBBox] = None
    var rts: Option[Long] = None
    var rseq: Option[Long] = None
    var rurl: Option[String] = None
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 =>
          val b = r.subReader()
          var l, rr, tp, bt = 0L
          var bt2 = b.readTag()
          while (bt2 != 0) {
            (bt2 >> 3) match {
              case 1 => l = b.readSint()
              case 2 => rr = b.readSint()
              case 3 => tp = b.readSint()
              case 4 => bt = b.readSint()
              case _ => b.skip(bt2 & 7)
            }
            bt2 = b.readTag()
          }
          bbox = Some(HeaderBBox(l, rr, tp, bt))
        case 4 => req += r.readString()
        case 5 => opt += r.readString()
        case 16 => wp = r.readString()
        case 17 => src = r.readString()
        case 32 => rts = Some(r.readVarint())
        case 33 => rseq = Some(r.readVarint())
        case 34 => rurl = Some(r.readString())
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    HeaderMeta(req.result(), opt.result(), wp, src, bbox, rts, rseq, rurl)
  }

  // -------------------------------------------------------- PrimitiveBlock
  /** Per-element callback target. Tag arrays are parallel key/value string
    * arrays (already resolved through the block string table); `info` is
    * null when absent or pruned. Coordinates are both raw nanodegrees and
    * derived degrees (granularity math: reference block.rs:149-159).
    */
  trait ElementHandler {
    def onNode(id: Long, latNd: Long, lonNd: Long, lat: Double, lon: Double,
        tagK: Array[String], tagV: Array[String], info: InfoData): Unit
    def onWay(id: Long, refs: Array[Long],
        tagK: Array[String], tagV: Array[String], info: InfoData): Unit
    def onRelation(id: Long, memids: Array[Long], roles: Array[String], types: Array[Byte],
        tagK: Array[String], tagV: Array[String], info: InfoData): Unit
    def onChangeSet(id: Long, tagK: Array[String], tagV: Array[String]): Unit
  }

  /** Mutable per-element metadata (reference info.rs:3-33; visible
    * defaults true). tsMillis already scaled by date_granularity. */
  final class InfoData {
    var version: Int = -1
    var tsMillis: Long = 0L
    // presence flag: an Info message legitimately OMITS the timestamp —
    // surfacing the 0L default as 1970-01-01 would make `ts IS NULL` never
    // match and skew min/time-bucket aggregations with bogus epoch values
    var tsSeen: Boolean = false
    var changeset: Long = -1L
    var uid: Int = -1
    var user: String = ""
    var visible: Boolean = true
  }

  final val MemberTypeNames: Array[String] = Array("node", "way", "relation")

  /** Member-type name with the same out-of-range discipline as the
    * string-table lookup (BlockCtx.str clamps to ""): a corrupt or
    * forward-versioned member_type (e.g. 3, or 200 truncated to a negative
    * byte on the wire) maps to "" instead of crashing the task with an
    * ArrayIndexOutOfBoundsException. Downstream role/type filters simply
    * never match the unknown type. */
  def memberTypeName(t: Int): String =
    if (t >= 0 && t < MemberTypeNames.length) MemberTypeNames(t) else ""

  private val EmptyStrings = new Array[String](0)

  /** Decode one PrimitiveBlock. `kinds` is a bitmask of Kind* to decode
    * (blob-internal pushdown — reference F1 semantics, indexed_reader.rs:32-90);
    * `wantTags`/`wantInfo` prune string-table resolution work (column
    * pruning reaching into the decoder).
    */
  def decodeBlock(buf: Array[Byte], handler: ElementHandler,
      kinds: Int = KindAll, wantTags: Boolean = true, wantInfo: Boolean = true): Unit = {
    val r = new ProtoReader(buf, 0, buf.length)
    // First pass: locate stringtable + params + group ranges. Groups may
    // precede the stringtable in the byte stream, so collect then decode.
    var strings: Array[String] = EmptyStrings
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGranularity = 1000L
    val groups = new IntBuf(8) // pairs (start, end)
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => // StringTable{ repeated bytes s = 1 } — index 0 must be ""
          val (s, e) = r.readLenRange()
          val st = new ProtoReader(buf, s, e)
          val b = Seq.newBuilder[String]
          var st2 = st.readTag()
          while (st2 != 0) {
            if ((st2 >> 3) == 1) b += st.readString() else st.skip(st2 & 7)
            st2 = st.readTag()
          }
          strings = b.result().toArray
        case 2 =>
          val (s, e) = r.readLenRange(); groups.add(s); groups.add(e)
        case 17 => granularity = r.readVarint()
        case 18 => dateGranularity = r.readVarint()
        case 19 => latOffset = r.readVarint()
        case 20 => lonOffset = r.readVarint()
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    val ctx = new BlockCtx(buf, strings, granularity, latOffset, lonOffset,
      dateGranularity, handler, kinds, wantTags, wantInfo)
    var g = 0
    while (g < groups.length) {
      decodeGroup(ctx, groups(g), groups(g + 1))
      g += 2
    }
  }

  private final class BlockCtx(
      val buf: Array[Byte], val strings: Array[String],
      val granularity: Long, val latOffset: Long, val lonOffset: Long,
      val dateGranularity: Long, val handler: ElementHandler,
      val kinds: Int, val wantTags: Boolean, val wantInfo: Boolean) {
    /** String-table lookup: index 0 / out-of-bounds → "" (reference
      * string_table.rs:25-36). */
    def str(i: Long): String =
      if (i <= 0 || i >= strings.length) "" else strings(i.toInt)
  }

  private def decodeGroup(ctx: BlockCtx, from: Int, to: Int): Unit = {
    val r = new ProtoReader(ctx.buf, from, to)
    var t = r.readTag()
    while (t != 0) {
      val field = t >> 3
      field match {
        case 1 if (ctx.kinds & KindNode) != 0 =>
          val (s, e) = r.readLenRange(); decodeSparseNode(ctx, s, e)
        case 2 if (ctx.kinds & KindNode) != 0 =>
          val (s, e) = r.readLenRange(); decodeDense(ctx, s, e)
        case 3 if (ctx.kinds & KindWay) != 0 =>
          val (s, e) = r.readLenRange(); decodeWay(ctx, s, e)
        case 4 if (ctx.kinds & KindRelation) != 0 =>
          val (s, e) = r.readLenRange(); decodeRelation(ctx, s, e)
        case 5 if (ctx.kinds & KindChangeSet) != 0 =>
          val (s, e) = r.readLenRange(); decodeChangeSet(ctx, s, e)
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
  }

  private def resolveTags(ctx: BlockCtx, keys: LongBuf, vals: LongBuf): (Array[String], Array[String]) = {
    // parallel-array invariant: keys.len == vals.len (reference node.rs:49)
    val n = math.min(keys.length, vals.length)
    if (!ctx.wantTags || n == 0) (EmptyStrings, EmptyStrings)
    else {
      val k = new Array[String](n)
      val v = new Array[String](n)
      var i = 0
      while (i < n) { k(i) = ctx.str(keys(i)); v(i) = ctx.str(vals(i)); i += 1 }
      (k, v)
    }
  }

  private def parseInfo(ctx: BlockCtx, s: Int, e: Int): InfoData = {
    if (!ctx.wantInfo) return null
    val r = new ProtoReader(ctx.buf, s, e)
    val info = new InfoData
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => info.version = r.readVarint().toInt
        case 2 => info.tsMillis = r.readVarint() * ctx.dateGranularity; info.tsSeen = true
        case 3 => info.changeset = r.readVarint()
        case 4 => info.uid = r.readVarint().toInt
        case 5 => info.user = ctx.str(r.readVarint())
        case 6 => info.visible = r.readVarint() != 0
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    info
  }

  private def decodeSparseNode(ctx: BlockCtx, s: Int, e: Int): Unit = {
    val r = new ProtoReader(ctx.buf, s, e)
    var id = 0L
    var rawLat = 0L
    var rawLon = 0L
    val keys = new LongBuf(4)
    val vals = new LongBuf(4)
    var info: InfoData = null
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => id = r.readSint()
        case 2 => r.readPackedVarints(t & 7, keys)
        case 3 => r.readPackedVarints(t & 7, vals)
        case 4 => val (is, ie) = r.readLenRange(); info = parseInfo(ctx, is, ie)
        case 8 => rawLat = r.readSint()
        case 9 => rawLon = r.readSint()
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    val latNd = ctx.latOffset + ctx.granularity * rawLat
    val lonNd = ctx.lonOffset + ctx.granularity * rawLon
    val (tk, tv) = resolveTags(ctx, keys, vals)
    ctx.handler.onNode(id, latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, tk, tv, info)
  }

  /** DenseNodes: the columnar delta-encoded fast path (reference
    * dense_nodes.rs:5-25, dense_info.rs:4-28). Delta chains never cross a
    * block boundary, so each blob decodes independently — the basis of
    * partition-parallel decode (SURVEY.md §1.2).
    */
  private def decodeDense(ctx: BlockCtx, s: Int, e: Int): Unit = {
    val r = new ProtoReader(ctx.buf, s, e)
    val ids = new LongBuf(1024)
    val lats = new LongBuf(1024)
    val lons = new LongBuf(1024)
    val kvs = new LongBuf(2048)
    // DenseInfo columns
    var diVersion: LongBuf = null
    var diTs: LongBuf = null
    var diChangeset: LongBuf = null
    var diUid: LongBuf = null
    var diUserSid: LongBuf = null
    var diVisible: LongBuf = null
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => r.readPackedSints(t & 7, ids)
        case 5 if ctx.wantInfo =>
          val (ds, de) = r.readLenRange()
          val di = new ProtoReader(ctx.buf, ds, de)
          diVersion = new LongBuf(1024); diTs = new LongBuf(1024)
          diChangeset = new LongBuf(1024); diUid = new LongBuf(1024)
          diUserSid = new LongBuf(1024); diVisible = new LongBuf(1024)
          var dt = di.readTag()
          while (dt != 0) {
            (dt >> 3) match {
              case 1 => di.readPackedVarints(dt & 7, diVersion)
              case 2 => di.readPackedSints(dt & 7, diTs)
              case 3 => di.readPackedSints(dt & 7, diChangeset)
              case 4 => di.readPackedSints(dt & 7, diUid)
              case 5 => di.readPackedSints(dt & 7, diUserSid)
              case 6 => di.readPackedVarints(dt & 7, diVisible)
              case _ => di.skip(dt & 7)
            }
            dt = di.readTag()
          }
        case 8 => r.readPackedSints(t & 7, lats)
        case 9 => r.readPackedSints(t & 7, lons)
        case 10 => r.readPackedVarints(t & 7, kvs)
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    // stateful prefix-sum decode (dense_nodes.rs:7-24; dense_info deltas)
    ids.prefixSum(); lats.prefixSum(); lons.prefixSum()
    if (diTs != null) { diTs.prefixSum(); diChangeset.prefixSum(); diUid.prefixSum(); diUserSid.prefixSum() }
    var kvPos = 0
    val n = ids.length
    var i = 0
    while (i < n) {
      val latNd = ctx.latOffset + ctx.granularity * lats(i)
      val lonNd = ctx.lonOffset + ctx.granularity * lons(i)
      // keys_vals: [k1,v1,k2,v2,...,0] per node, 0 terminates
      // (dense_nodes.rs:22-24)
      var tk: Array[String] = EmptyStrings
      var tv: Array[String] = EmptyStrings
      if (kvPos < kvs.length) {
        val startKv = kvPos
        var cnt = 0
        while (kvPos < kvs.length && kvs(kvPos) != 0L) {
          kvPos += (if (kvPos + 1 < kvs.length) 2 else 1)
          cnt += 1
        }
        if (kvPos < kvs.length) kvPos += 1 // consume terminator
        if (ctx.wantTags && cnt > 0) {
          tk = new Array[String](cnt)
          tv = new Array[String](cnt)
          var j = 0
          while (j < cnt) {
            tk(j) = ctx.str(kvs(startKv + 2 * j))
            tv(j) = if (startKv + 2 * j + 1 < kvs.length) ctx.str(kvs(startKv + 2 * j + 1)) else ""
            j += 1
          }
        }
      }
      var info: InfoData = null
      if (diVersion != null && i < diVersion.length) {
        info = new InfoData
        info.version = diVersion(i).toInt
        if (i < diTs.length) { info.tsMillis = diTs(i) * ctx.dateGranularity; info.tsSeen = true }
        if (i < diChangeset.length) info.changeset = diChangeset(i)
        if (i < diUid.length) info.uid = diUid(i).toInt
        if (i < diUserSid.length) info.user = ctx.str(diUserSid(i))
        if (i < diVisible.length) info.visible = diVisible(i) != 0
      }
      ctx.handler.onNode(ids(i), latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, tk, tv, info)
      i += 1
    }
  }

  private def decodeWay(ctx: BlockCtx, s: Int, e: Int): Unit = {
    val r = new ProtoReader(ctx.buf, s, e)
    var id = 0L
    val keys = new LongBuf(4)
    val vals = new LongBuf(4)
    val refs = new LongBuf(16)
    var info: InfoData = null
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => id = r.readVarint()
        case 2 => r.readPackedVarints(t & 7, keys)
        case 3 => r.readPackedVarints(t & 7, vals)
        case 4 => val (is, ie) = r.readLenRange(); info = parseInfo(ctx, is, ie)
        case 8 => r.readPackedSints(t & 7, refs) // delta-encoded (way.rs:21-23)
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    refs.prefixSum()
    val (tk, tv) = resolveTags(ctx, keys, vals)
    ctx.handler.onWay(id, refs.toArray, tk, tv, info)
  }

  private def decodeRelation(ctx: BlockCtx, s: Int, e: Int): Unit = {
    val r = new ProtoReader(ctx.buf, s, e)
    var id = 0L
    val keys = new LongBuf(4)
    val vals = new LongBuf(4)
    val roles = new LongBuf(8)
    val memids = new LongBuf(8)
    val types = new LongBuf(8)
    var info: InfoData = null
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => id = r.readVarint()
        case 2 => r.readPackedVarints(t & 7, keys)
        case 3 => r.readPackedVarints(t & 7, vals)
        case 4 => val (is, ie) = r.readLenRange(); info = parseInfo(ctx, is, ie)
        case 8 => r.readPackedVarints(t & 7, roles) // string-table indices (relation.rs:22-24)
        case 9 => r.readPackedSints(t & 7, memids) // delta-encoded (relation.rs:26-28)
        case 10 => r.readPackedVarints(t & 7, types) // 0=node,1=way,2=relation (member_type.rs:4-8)
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    memids.prefixSum()
    val n = memids.length
    val roleArr = new Array[String](n)
    val typeArr = new Array[Byte](n)
    var i = 0
    while (i < n) {
      roleArr(i) = if (i < roles.length) ctx.str(roles(i)) else ""
      typeArr(i) = if (i < types.length) types(i).toByte else 0
      i += 1
    }
    val (tk, tv) = resolveTags(ctx, keys, vals)
    ctx.handler.onRelation(id, memids.toArray, roleArr, typeArr, tk, tv, info)
  }

  /** ChangeSet carries id + keys/vals like the other elements
    * (changeset.rs:5-20) — round 1 parsed only the id and dropped tags. */
  private def decodeChangeSet(ctx: BlockCtx, s: Int, e: Int): Unit = {
    val r = new ProtoReader(ctx.buf, s, e)
    var id = 0L
    val keys = new LongBuf(4)
    val vals = new LongBuf(4)
    var t = r.readTag()
    while (t != 0) {
      (t >> 3) match {
        case 1 => id = r.readVarint()
        case 2 => r.readPackedVarints(t & 7, keys)
        case 3 => r.readPackedVarints(t & 7, vals)
        case _ => r.skip(t & 7)
      }
      t = r.readTag()
    }
    val (tk, tv) = resolveTags(ctx, keys, vals)
    ctx.handler.onChangeSet(id, tk, tv)
  }
}
