package graft.osmpbf.codec

import graft.osmpbf.model._

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import scala.collection.mutable

/** Spec-compliant .osm.pbf writer — the deterministic fixture generator
  * SURVEY.md §5/§7.2 calls for (the reference ships no real sample files;
  * its fixtures are built inline, mmap_blob.rs:494-516). Also doubles as a
  * real sink for the decoded tables.
  *
  * Framing: `u32_be(len(BlobHeader)) ++ BlobHeader ++ Blob[datasize]`.
  * Payload blocks are zlib-compressed (blob.rs:114-133 ZlibData) unless
  * `compress=false` (raw) or `codec` selects another spec codec: "zstd"
  * (field 7, seen on newer planet dumps), "lzma" (field 4), "bzip2"
  * (field 5, obsolete) or "lz4" (field 6, standard frame format). Each
  * BlobHeader carries our indexdata stats message
  * (FrameScanner.BlobStats) so blob-level pushdown works on our own files.
  *
  * Coordinate encoding inverts the granularity transform
  * (block.rs:149-159): raw = (nd - offset) / granularity, requiring exact
  * divisibility (fixture generators control their grid accordingly).
  */
final class PbfWriter(
    sink: java.io.OutputStream,
    granularity: Long = 100L,
    latOffset: Long = 0L,
    lonOffset: Long = 0L,
    dateGranularity: Long = 1000L,
    compress: Boolean = true,
    dense: Boolean = true,
    elementsPerBlock: Int = 8000,
    codec: String = "zlib",
    withStats: Boolean = true) {

  require(Set("zlib", "zstd", "lzma", "bzip2", "lz4").contains(codec),
    s"unsupported write codec $codec (zlib, zstd, lzma, bzip2 or lz4)")

  private val out = new DataOutputStream(sink)
  private val nodes = mutable.ArrayBuffer.empty[OsmNode]
  private val ways = mutable.ArrayBuffer.empty[OsmWay]
  private val relations = mutable.ArrayBuffer.empty[OsmRelation]
  private val changesets = mutable.ArrayBuffer.empty[OsmChangeSet]
  private var headerWritten = false
  private var closed = false

  def writeHeader(meta: HeaderMeta): Unit = {
    require(!headerWritten, "header already written")
    val hb = new ProtoWriter
    meta.bbox.foreach { b =>
      val bw = new ProtoWriter
      bw.sint(1, b.left); bw.sint(2, b.right); bw.sint(3, b.top); bw.sint(4, b.bottom)
      hb.message(1, bw)
    }
    meta.required_features.foreach(hb.string(4, _))
    meta.optional_features.foreach(hb.string(5, _))
    if (meta.writing_program.nonEmpty) hb.string(16, meta.writing_program)
    if (meta.source.nonEmpty) hb.string(17, meta.source)
    meta.replication_timestamp.foreach(hb.varint(32, _))
    meta.replication_sequence.foreach(hb.varint(33, _))
    meta.replication_base_url.foreach(hb.string(34, _))
    writeFrame("OSMHeader", hb.toBytes, None)
    headerWritten = true
  }

  def addNode(n: OsmNode): Unit = { nodes += n; maybeFlush() }
  def addWay(w: OsmWay): Unit = { ways += w; maybeFlush() }
  def addRelation(r: OsmRelation): Unit = { relations += r; maybeFlush() }
  def addChangeSet(c: OsmChangeSet): Unit = { changesets += c; maybeFlush() }

  private def maybeFlush(): Unit =
    if (nodes.size + ways.size + relations.size + changesets.size >= elementsPerBlock) flushBlock()

  def close(): Unit = if (!closed) {
    if (!headerWritten)
      writeHeader(HeaderMeta(Seq("OsmSchema-V0.6", "DenseNodes"), Nil, "graft-pbf-writer", "", None, None, None, None))
    flushBlock()
    out.close()
    closed = true
  }

  // ----------------------------------------------------------------- block
  private def flushBlock(): Unit = {
    if (nodes.isEmpty && ways.isEmpty && relations.isEmpty && changesets.isEmpty) return
    // the OSMHeader frame must precede any OSMData frame (external OSM
    // readers require HeaderBlock-first; only our own scanner tolerates
    // header-anywhere) — emit the default header if the caller never did
    if (!headerWritten)
      writeHeader(HeaderMeta(Seq("OsmSchema-V0.6", "DenseNodes"), Nil, "graft-pbf-writer", "", None, None, None, None))
    val strings = new StringInterner
    val block = new ProtoWriter

    val groups = mutable.ArrayBuffer.empty[ProtoWriter]
    if (nodes.nonEmpty) {
      if (dense) groups ++= denseGroups(strings) else groups += sparseGroup(strings)
    }
    if (ways.nonEmpty) groups += wayGroup(strings)
    if (relations.nonEmpty) groups += relationGroup(strings)
    if (changesets.nonEmpty) groups += changesetGroup(strings)

    // stringtable (field 1) must resolve before groups at decode time, but
    // our decoder two-passes the block so field order is free; we still
    // write it first per convention.
    val st = new ProtoWriter
    strings.all.foreach(s => st.bytes(1, s.getBytes("UTF-8")))
    block.message(1, st)
    groups.foreach(block.message(2, _))
    if (granularity != 100L) block.varint(17, granularity)
    if (dateGranularity != 1000L) block.varint(18, dateGranularity)
    if (latOffset != 0L) block.varint(19, latOffset)
    if (lonOffset != 0L) block.varint(20, lonOffset)

    // withStats=false emulates a FOREIGN writer (planet dumps, osmium):
    // no indexdata → readers see unknown counts — the input the sidecar
    // stats builder (OsmStats.buildBlobStats) exists for
    val indexdata = if (!withStats) None else {
      val allIds = nodes.iterator.map(_.id) ++ ways.iterator.map(_.id) ++
        relations.iterator.map(_.id) ++ changesets.iterator.map(_.id)
      val ids = allIds.toArray
      val stats = new ProtoWriter
      stats.varint(1, nodes.size.toLong)
      stats.varint(2, ways.size.toLong)
      stats.varint(3, relations.size.toLong)
      stats.varint(4, changesets.size.toLong)
      if (ids.nonEmpty) { stats.sint(5, ids.min); stats.sint(6, ids.max) }
      Some(stats.toBytes)
    }
    writeFrame("OSMData", block.toBytes, indexdata)
    nodes.clear(); ways.clear(); relations.clear(); changesets.clear()
  }

  private def rawLat(nd: Long): Long = {
    val d = nd - latOffset
    require(d % granularity == 0, s"lat_nd $nd not on granularity grid")
    d / granularity
  }
  private def rawLon(nd: Long): Long = {
    val d = nd - lonOffset
    require(d % granularity == 0, s"lon_nd $nd not on granularity grid")
    d / granularity
  }

  private def infoMsg(strings: StringInterner, i: OsmInfo): ProtoWriter = {
    val w = new ProtoWriter
    w.varint(1, i.version.toLong)
    // ts is nullable end-to-end (readers surface an omitted spec-optional
    // timestamp as NULL, never a fabricated 1970 epoch) — a null here means
    // OMIT field 2 so the absence round-trips
    if (i.ts != null) w.varint(2, i.ts.getTime / dateGranularity)
    w.varint(3, i.changeset)
    w.varint(4, i.uid.toLong)
    w.varint(5, strings.id(i.user).toLong)
    w.bool(6, i.visible)
    w
  }

  private def sparseGroup(strings: StringInterner): ProtoWriter = {
    val g = new ProtoWriter
    nodes.foreach { n =>
      val nw = new ProtoWriter
      nw.sint(1, n.id)
      val tags = n.tags.toSeq
      nw.packedVarints(2, tags.map(t => strings.id(t._1).toLong))
      nw.packedVarints(3, tags.map(t => strings.id(t._2).toLong))
      n.info.foreach(i => nw.message(4, infoMsg(strings, i)))
      nw.sint(8, rawLat(n.lat_nd))
      nw.sint(9, rawLon(n.lon_nd))
      g.message(1, nw)
    }
    g
  }

  /** DenseInfo is all-or-nothing per DenseNodes message, and its arrays are
    * positional — per-element absence is inexpressible — so nodes split into
    * groups by info shape: info-with-ts, info-without-ts (the spec-optional
    * timestamp array is omitted wholesale), and no info. Each distinction
    * survives the round trip. */
  private def denseGroups(strings: StringInterner): Seq[ProtoWriter] = {
    val (withInfo, withoutInfo) = nodes.partition(_.info.isDefined)
    val (withTs, withoutTs) = withInfo.partition(_.info.get.ts != null)
    Seq(withTs, withoutTs, withoutInfo).filter(_.nonEmpty).map { ns =>
      val dn = new ProtoWriter
      dn.packedDeltaSints(1, ns.map(_.id))
      if (ns.head.info.isDefined) {
        val di = new ProtoWriter
        val infos = ns.map(_.info.get)
        di.packedVarints(1, infos.map(_.version.toLong))
        if (infos.head.ts != null)
          di.packedDeltaSints(2, infos.map(_.ts.getTime / dateGranularity))
        di.packedDeltaSints(3, infos.map(_.changeset))
        di.packedDeltaSints(4, infos.map(_.uid.toLong))
        di.packedDeltaSints(5, infos.map(i => strings.id(i.user).toLong))
        di.packedVarints(6, infos.map(i => if (i.visible) 1L else 0L))
        dn.message(5, di)
      }
      dn.packedDeltaSints(8, ns.map(n => rawLat(n.lat_nd)))
      dn.packedDeltaSints(9, ns.map(n => rawLon(n.lon_nd)))
      // keys_vals: [k1,v1,...,0] per node (dense_nodes.rs:22-24)
      val kvs = mutable.ArrayBuffer.empty[Long]
      ns.foreach { n =>
        n.tags.foreach { case (k, v) => kvs += strings.id(k).toLong; kvs += strings.id(v).toLong }
        kvs += 0L
      }
      if (ns.exists(_.tags.nonEmpty)) dn.packedVarints(10, kvs)
      val g = new ProtoWriter
      g.message(2, dn)
      g
    }
  }

  private def wayGroup(strings: StringInterner): ProtoWriter = {
    val g = new ProtoWriter
    ways.foreach { w =>
      val ww = new ProtoWriter
      ww.varint(1, w.id)
      val tags = w.tags.toSeq
      ww.packedVarints(2, tags.map(t => strings.id(t._1).toLong))
      ww.packedVarints(3, tags.map(t => strings.id(t._2).toLong))
      w.info.foreach(i => ww.message(4, infoMsg(strings, i)))
      ww.packedDeltaSints(8, w.refs)
      g.message(3, ww)
    }
    g
  }

  private def relationGroup(strings: StringInterner): ProtoWriter = {
    val g = new ProtoWriter
    relations.foreach { r =>
      val rw = new ProtoWriter
      rw.varint(1, r.id)
      val tags = r.tags.toSeq
      rw.packedVarints(2, tags.map(t => strings.id(t._1).toLong))
      rw.packedVarints(3, tags.map(t => strings.id(t._2).toLong))
      r.info.foreach(i => rw.message(4, infoMsg(strings, i)))
      rw.packedVarints(8, r.members.map(m => strings.id(m.role).toLong))
      rw.packedDeltaSints(9, r.members.map(_.memid))
      rw.packedVarints(10, r.members.map(m => PbfCodec.MemberTypeNames.indexOf(m.mtype).max(0).toLong))
      g.message(4, rw)
    }
    g
  }

  private def changesetGroup(strings: StringInterner): ProtoWriter = {
    val g = new ProtoWriter
    changesets.foreach { c =>
      val cw = new ProtoWriter
      cw.varint(1, c.id)
      val tags = c.tags.toSeq
      cw.packedVarints(2, tags.map(t => strings.id(t._1).toLong))
      cw.packedVarints(3, tags.map(t => strings.id(t._2).toLong))
      g.message(5, cw)
    }
    g
  }

  private def writeFrame(blobType: String, payload: Array[Byte], indexdata: Option[Array[Byte]]): Unit = {
    require(payload.length <= PbfCodec.MaxMessageSize,
      s"block of ${payload.length} bytes exceeds 32MiB cap (blob.rs:5-9)")
    val blob = new ProtoWriter
    if (compress) {
      blob.varint(2, payload.length.toLong)
      codec match {
        case "zstd" => blob.bytes(7, com.github.luben.zstd.Zstd.compress(payload))
        case "lzma" =>
          val bos = new java.io.ByteArrayOutputStream()
          val lz = new org.tukaani.xz.LZMAOutputStream(
            bos, new org.tukaani.xz.LZMA2Options(), payload.length.toLong)
          lz.write(payload); lz.finish()
          blob.bytes(4, bos.toByteArray)
        case "bzip2" =>
          val bos = new java.io.ByteArrayOutputStream()
          val bz = new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorOutputStream(bos)
          bz.write(payload); bz.close()
          blob.bytes(5, bos.toByteArray)
        case "lz4" =>
          val bos = new java.io.ByteArrayOutputStream()
          val lz4 = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
          lz4.write(payload); lz4.close()
          blob.bytes(6, bos.toByteArray)
        case _ => blob.bytes(3, PbfCodec.deflate(payload))
      }
    } else blob.bytes(1, payload)
    val blobBytes = blob.toBytes

    val bh = new ProtoWriter
    bh.string(1, blobType)
    indexdata.foreach(bh.bytes(2, _))
    bh.varint(3, blobBytes.length.toLong)
    val bhBytes = bh.toBytes
    require(bhBytes.length <= PbfCodec.MaxHeaderSize, "BlobHeader exceeds 64KiB cap")

    out.writeInt(bhBytes.length)
    out.write(bhBytes)
    out.write(blobBytes)
  }
}

object PbfWriter {
  /** Local-file convenience (fixtures, tests). Distributed sinks should
    * construct over a Hadoop FS stream instead — see OsmPbfSink. */
  def apply(path: String,
      granularity: Long = 100L,
      latOffset: Long = 0L,
      lonOffset: Long = 0L,
      dateGranularity: Long = 1000L,
      compress: Boolean = true,
      dense: Boolean = true,
      elementsPerBlock: Int = 8000,
      codec: String = "zlib",
      withStats: Boolean = true): PbfWriter =
    new PbfWriter(new BufferedOutputStream(new FileOutputStream(path), 1 << 16),
      granularity, latOffset, lonOffset, dateGranularity, compress, dense,
      elementsPerBlock, codec, withStats)
}

/** Per-block string table with index 0 fixed to "" (string_table.rs:11-16). */
final class StringInterner {
  private val idx = mutable.LinkedHashMap[String, Int]("" -> 0)
  def id(s: String): Int = idx.getOrElseUpdate(s, idx.size)
  def all: Seq[String] = idx.keys.toSeq
}
