package graft.osmpbf

import graft.fixtures.OsmWorld
import graft.osmpbf.codec._
import graft.osmpbf.model._

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenSupport

import java.nio.file.Files
import java.sql.Timestamp

class CodecSpec extends AnyFunSuite with GenSupport {

  private def tmpFile(suffix: String): String = {
    val f = Files.createTempFile("codecspec", suffix)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("varint round trip (property)") {
    forAllG(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val w = new ProtoWriter
      w.writeRawVarint(v)
      val b = w.toBytes
      val r = new ProtoReader(b, 0, b.length)
      assert(r.readVarint() === v)
      assert(!r.hasNext)
    }
  }

  test("zigzag round trip incl. extremes") {
    forAllG(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { v =>
      assert(Proto.zigzagDecode(Proto.zigzagEncode(v)) === v)
    }
    for (v <- Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue))
      assert(Proto.zigzagDecode(Proto.zigzagEncode(v)) === v)
  }

  test("delta encode ∘ prefix-sum decode = identity (property)") {
    forAllG(Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))) { vs =>
      val w = new ProtoWriter
      w.packedDeltaSints(1, vs)
      val bytes = w.toBytes
      val out = new LongBuf()
      val r = new ProtoReader(bytes, 0, bytes.length)
      var t = r.readTag()
      while (t != 0) { r.readPackedSints(t & 7, out); t = r.readTag() }
      assert(out.prefixSum().toArray.toList === vs)
    }
  }

  /** The reference's own framed fixture (mmap_blob.rs:494-516): one frame of
    * u32_be(100) ++ 100 zero bytes → blob_count==1, file_size==104, and the
    * blob carries 100 bytes. Our scanner indexes it as an Unknown blob. */
  test("reference zeros fixture: 1 unknown blob, file size 104") {
    val path = tmpFile(".pbf")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(path))
    out.writeInt(100)
    out.write(new Array[Byte](100))
    out.close()
    val res = FrameScanner.scan(path)
    assert(res.fileSize === 104)
    assert(res.blobs.size === 1)
    assert(res.blobs.head.blobType === "Unknown")
    assert(res.blobs.head.dataSize === 100)
    val dec = PbfFile.read(path)
    assert(dec.nodes.isEmpty && dec.errorCount === 0)
  }

  test("trailing garbage after last frame is tolerated (indexed_reader.rs:167-171)") {
    val path = tmpFile(".pbf")
    val world = OsmWorld.generate(seed = 7, nClusters = 1, nodesPerCluster = 30)
    OsmWorld.writePbf(path, world)
    val fos = new java.io.FileOutputStream(path, true)
    fos.write(Array[Byte](0, 0, 1)) // 3 stray bytes: not even a full length prefix
    fos.close()
    val dec = PbfFile.read(path)
    assert(dec.nodes.size === world.nodes.size)
  }

  test("full world round trip: byte-exact counts, tags, coordinates, info") {
    val path = tmpFile(".pbf")
    val world = OsmWorld.generate(seed = 42, nClusters = 3, nodesPerCluster = 80)
    OsmWorld.writePbf(path, world, elementsPerBlock = 500)
    val dec = PbfFile.read(path)

    assert(dec.nodes.size === world.nodes.size)
    assert(dec.ways.size === world.ways.size)
    assert(dec.relations.size === world.relations.size)

    val gotNodes = dec.nodes.map(n => n.id -> n).toMap
    world.nodes.foreach { exp =>
      val got = gotNodes(exp.id)
      assert(got.lat_nd === exp.lat_nd, s"node ${exp.id} lat_nd")
      assert(got.lon_nd === exp.lon_nd, s"node ${exp.id} lon_nd")
      assert(got.lat === exp.lat_nd * 1e-9)
      assert(got.tags === exp.tags, s"node ${exp.id} tags")
      assert(got.info.map(_.ts) === exp.info.map(_.ts))
      assert(got.info.map(_.user) === exp.info.map(_.user))
      assert(got.info.map(_.version) === exp.info.map(_.version))
    }
    val gotWays = dec.ways.map(w => w.id -> w).toMap
    world.ways.foreach { exp =>
      val got = gotWays(exp.id)
      assert(got.refs === exp.refs, s"way ${exp.id} refs")
      assert(got.tags === exp.tags)
    }
    val gotRels = dec.relations.map(r => r.id -> r).toMap
    world.relations.foreach { exp =>
      val got = gotRels(exp.id)
      assert(got.members === exp.members)
      assert(got.tags === exp.tags)
    }
    // header metadata survives
    val h = dec.header.get
    assert(h.required_features === Seq("OsmSchema-V0.6", "DenseNodes"))
    assert(h.replication_sequence === Some(4242L))
    assert(h.bbox.isDefined)
  }

  test("granularity/offset variants decode identically (block.rs:149-159)") {
    val world = OsmWorld.generate(seed = 11, nClusters = 2, nodesPerCluster = 40)
    val variants = Seq(
      (100L, 0L, 0L), (100L, 500000000L, 500000000L), (1000L, 0L, 0L))
    val decoded = variants.map { case (g, la, lo) =>
      // snap world coords onto the coarser grid relative to offsets
      val snapped = world.copy(nodes = world.nodes.map { n =>
        val latNd = la + ((n.lat_nd - la) / g) * g
        val lonNd = lo + ((n.lon_nd - lo) / g) * g
        n.copy(lat_nd = latNd, lon_nd = lonNd, lat = latNd * 1e-9, lon = lonNd * 1e-9)
      })
      val path = tmpFile(".pbf")
      OsmWorld.writePbf(path, snapped, granularity = g, latOffset = la, lonOffset = lo)
      (snapped, PbfFile.read(path))
    }
    decoded.foreach { case (exp, got) =>
      assert(got.nodes.sortBy(_.id).map(n => (n.id, n.lat_nd, n.lon_nd)) ===
        exp.nodes.sortBy(_.id).map(n => (n.id, n.lat_nd, n.lon_nd)))
    }
  }

  test("sparse vs dense node encoding decode to identical elements") {
    val world = OsmWorld.generate(seed = 5, nClusters = 2, nodesPerCluster = 50)
    val p1 = tmpFile(".pbf"); val p2 = tmpFile(".pbf")
    OsmWorld.writePbf(p1, world, dense = true)
    OsmWorld.writePbf(p2, world, dense = false)
    val d1 = PbfFile.read(p1); val d2 = PbfFile.read(p2)
    // group splitting may reorder within a block; compare by id
    assert(d1.nodes.sortBy(_.id).map(_.copy(blob_offset = 0L)) === d2.nodes.sortBy(_.id).map(_.copy(blob_offset = 0L)))
  }

  test("uncompressed (raw) blobs decode identically to zlib blobs") {
    val world = OsmWorld.generate(seed = 5, nClusters = 1, nodesPerCluster = 50)
    val p1 = tmpFile(".pbf"); val p2 = tmpFile(".pbf")
    OsmWorld.writePbf(p1, world, compress = true)
    OsmWorld.writePbf(p2, world, compress = false)
    assert(PbfFile.read(p1).nodes.sortBy(_.id).map(_.copy(blob_offset = 0L)) ===
      PbfFile.read(p2).nodes.sortBy(_.id).map(_.copy(blob_offset = 0L)))
  }

  test("zstd/lzma/bzip2/lz4-written .osm.pbf read identically to zlib (writer codec option)") {
    val world = OsmWorld.generate(seed = 11, nClusters = 1, nodesPerCluster = 40)
    def write(path: String, codec: String): Unit = {
      val w = PbfWriter(path, codec = codec)
      world.nodes.foreach(w.addNode)
      world.ways.foreach(w.addWay)
      w.close()
    }
    val pz = tmpFile(".pbf")
    write(pz, "zlib")
    val a = PbfFile.read(pz)
    for (codec <- Seq("zstd", "lzma", "bzip2", "lz4")) {
      val p = tmpFile(".pbf")
      write(p, codec)
      val b = PbfFile.read(p)
      assert(a.nodes.sortBy(_.id).map(_.copy(blob_offset = 0L)) ===
        b.nodes.sortBy(_.id).map(_.copy(blob_offset = 0L)), s"codec $codec")
      assert(a.ways.sortBy(_.id).map(_.copy(blob_offset = 0L)) ===
        b.ways.sortBy(_.id).map(_.copy(blob_offset = 0L)), s"codec $codec")
    }
  }

  test("zstd blobs decode (Blob field 7, blob.rs:130-133); corrupt/unsupported name themselves") {
    val payload = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val frame = com.github.luben.zstd.Zstd.compress(payload)
    // with raw_size (field 2) present
    val w1 = new ProtoWriter
    w1.varint(2, payload.length.toLong)
    w1.bytes(7, frame)
    val b1 = w1.toBytes
    assert(PbfCodec.decodeBlobPayload(b1, 0, b1.length).toSeq === payload.toSeq)
    // without raw_size: the zstd frame header's content size is used
    val w2 = new ProtoWriter
    w2.bytes(7, frame)
    val b2 = w2.toBytes
    assert(PbfCodec.decodeBlobPayload(b2, 0, b2.length).toSeq === payload.toSeq)
    // raw_size contradicting the frame → error, not silent truncation
    val w3 = new ProtoWriter
    w3.varint(2, payload.length.toLong - 1)
    w3.bytes(7, frame)
    val b3 = w3.toBytes
    val e = intercept[PbfParseException](PbfCodec.decodeBlobPayload(b3, 0, b3.length))
    assert(e.getMessage.contains("zstd"))
    // corrupt lzma (field 4) → typed error naming the codec, not a raw
    // IOException from the stream constructor
    val w4 = new ProtoWriter
    w4.bytes(4, Array[Byte](1, 2, 3))
    val b4 = w4.toBytes
    val e4 = intercept[PbfParseException](PbfCodec.decodeBlobPayload(b4, 0, b4.length))
    assert(e4.getMessage.contains("lzma"))
    // corrupt lz4 (field 6): bad frame magic → typed error naming the codec
    val w5 = new ProtoWriter
    w5.bytes(6, Array[Byte](1, 2, 3))
    val b5 = w5.toBytes
    val e5 = intercept[PbfParseException](PbfCodec.decodeBlobPayload(b5, 0, b5.length))
    assert(e5.getMessage.contains("lz4"))
    // streaming-API zstd frame: content size absent from the header AND no
    // raw_size field — legal per spec, must decode via the chunked path
    val bos = new java.io.ByteArrayOutputStream()
    val zs = new com.github.luben.zstd.ZstdOutputStream(bos)
    zs.write(payload); zs.close()
    val w6 = new ProtoWriter
    w6.bytes(7, bos.toByteArray)
    val b6 = w6.toBytes
    assert(PbfCodec.decodeBlobPayload(b6, 0, b6.length).toSeq === payload.toSeq)
  }

  test("coordinate bounds ±90/±180 survive round trip (nano_degree.rs:8-15)") {
    val path = tmpFile(".pbf")
    val mk = (id: Long, latNd: Long, lonNd: Long) =>
      OsmNode(id, latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, Map("k" -> "v"), None, 0L)
    val extremes = Vector(
      mk(1, 90000000000L, 180000000000L),
      mk(2, -90000000000L, -180000000000L),
      mk(3, 0L, 0L))
    val w = PbfWriter(path)
    extremes.foreach(w.addNode)
    w.close()
    val dec = PbfFile.read(path)
    assert(dec.nodes.map(n => (n.id, n.lat_nd, n.lon_nd)) ===
      extremes.map(n => (n.id, n.lat_nd, n.lon_nd)))
    assert(dec.nodes.find(_.id == 1).get.lat === 90.0)
    assert(dec.nodes.find(_.id == 2).get.lon === -180.0)
  }

  test("unicode + empty-string tags survive (string_table.rs edge cases)") {
    val path = tmpFile(".pbf")
    val tags = Map("name:ja" -> "東京", "emoji" -> "🗺️", "empty" -> "", "ascii" -> "x")
    val node = OsmNode(9L, 100L, 200L, 1e-7, 2e-7, tags, None, 0L)
    val w = PbfWriter(path)
    w.addNode(node)
    w.close()
    val dec = PbfFile.read(path)
    assert(dec.nodes.head.tags === tags)
  }

  test("kind pushdown decodes only requested groups (F1 semantics)") {
    val path = tmpFile(".pbf")
    val world = OsmWorld.generate(seed = 13, nClusters = 2, nodesPerCluster = 40)
    OsmWorld.writePbf(path, world)
    val waysOnly = PbfFile.read(path, kinds = PbfCodec.KindWay)
    assert(waysOnly.nodes.isEmpty)
    assert(waysOnly.ways.size === world.ways.size)
    assert(waysOnly.relations.isEmpty)
  }

  test("corrupt data blob is skipped and counted, not fatal (reader.rs:113-119)") {
    val path = tmpFile(".pbf")
    val world = OsmWorld.generate(seed = 3, nClusters = 1, nodesPerCluster = 30)
    OsmWorld.writePbf(path, world, elementsPerBlock = 20)
    // corrupt one data blob's payload bytes in place
    val scan = FrameScanner.scan(path)
    val dataBlob = scan.blobs.find(_.blobType == "OSMData").get
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.seek(dataBlob.dataOffset + dataBlob.dataSize / 2)
    raf.write(Array.fill[Byte](8)(0x55))
    raf.close()
    val dec = PbfFile.read(path)
    assert(dec.errorCount === 1)
    assert(dec.nodes.size < world.nodes.size)
    assert(dec.nodes.nonEmpty)
  }

  test("writer embeds per-blob stats; scanner recovers them (fixes ref F5 bug)") {
    val path = tmpFile(".pbf")
    val world = OsmWorld.generate(seed = 21, nClusters = 2, nodesPerCluster = 40)
    OsmWorld.writePbf(path, world, elementsPerBlock = 100)
    val scan = FrameScanner.scan(path)
    val data = scan.blobs.filter(_.blobType == "OSMData")
    assert(data.nonEmpty)
    assert(data.forall(_.nodeCount >= 0))
    assert(data.map(b => b.nodeCount + b.wayCount + b.relationCount).sum ===
      world.nodes.size + world.ways.size + world.relations.size)
    // id range populated and sane
    assert(data.forall(b => b.minId != Long.MinValue && b.maxId >= b.minId))
  }

  test("oversize uncompressed message is rejected (blob.rs:5-9 32MiB cap)") {
    intercept[PbfParseException] {
      PbfCodec.inflate(Array[Byte](1, 2, 3), 0, 3, PbfCodec.MaxMessageSize + 1)
    }
  }

  test("timestamp date_granularity scaling (block.rs:22-24)") {
    val path = tmpFile(".pbf")
    val ts = new Timestamp(1500000123000L) // multiple of 1000 ms
    val n = OsmNode(1L, 0L, 0L, 0, 0, Map.empty,
      Some(OsmInfo(2, ts, 55L, 9, "alice", visible = true)), 0L)
    val w = PbfWriter(path)
    w.addNode(n)
    w.close()
    val dec = PbfFile.read(path)
    val info = dec.nodes.head.info.get
    assert(info.ts === ts)
    assert(info.changeset === 55L)
    assert(info.user === "alice")
    assert(info.visible)
  }

  test("zlib blob without raw_size decodes (spec-optional field); stalls name themselves") {
    val payload = Array.tabulate[Byte](20000)(i => (i % 13).toByte)
    val z = PbfCodec.deflate(payload)
    // no field 2 (raw_size): stream-drain path — the old code demanded the
    // inflated size equal the 32 MiB cap and rejected every such blob
    val w = new ProtoWriter
    w.bytes(3, z)
    val b = w.toBytes
    assert(PbfCodec.decodeBlobPayload(b, 0, b.length).toSeq === payload.toSeq)
    // with raw_size still exact-size decoded
    val w2 = new ProtoWriter
    w2.varint(2, payload.length.toLong)
    w2.bytes(3, z)
    val b2 = w2.toBytes
    assert(PbfCodec.decodeBlobPayload(b2, 0, b2.length).toSeq === payload.toSeq)
    // FDICT (preset dictionary) streams fail fast, never spin: zlib header
    // 0x78 0xBF has the FDICT bit set (CMF=0x78, FLG with FDICT=1, check ok)
    val dict = Array[Byte](0x78.toByte, 0xbb.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    val w3 = new ProtoWriter
    w3.varint(2, 100L)
    w3.bytes(3, dict)
    val b3 = w3.toBytes
    val e = intercept[PbfParseException](PbfCodec.decodeBlobPayload(b3, 0, b3.length))
    assert(e.getMessage.contains("zlib"))
    // FDICT WITHOUT raw_size: the old InflaterInputStream drain returned
    // EOF on needsDictionary — a silently EMPTY payload (which even parses
    // as a valid empty block). Must fail fast like the sized path.
    val w4 = new ProtoWriter
    w4.bytes(3, dict)
    val b4 = w4.toBytes
    val e4 = intercept[PbfParseException](PbfCodec.decodeBlobPayload(b4, 0, b4.length))
    assert(e4.getMessage.contains("dictionary"), s"got: ${e4.getMessage}")
    // corrupt deflate bits surface as the typed parse error on BOTH paths
    // (raw DataFormatException would bypass permissive/stats callers)
    val bad = z.clone(); bad(z.length / 2) = (bad(z.length / 2) ^ 0x5a).toByte
    val w5 = new ProtoWriter; w5.varint(2, payload.length.toLong); w5.bytes(3, bad)
    val b5 = w5.toBytes
    intercept[PbfParseException](PbfCodec.decodeBlobPayload(b5, 0, b5.length))
    val w6 = new ProtoWriter; w6.bytes(3, bad)
    val b6 = w6.toBytes
    intercept[PbfParseException](PbfCodec.decodeBlobPayload(b6, 0, b6.length))
  }

  test("foreign indexdata without count fields is not trusted as zero counts") {
    // a foreign writer may use BlobHeader field 2 (spec: `optional bytes
    // indexdata`, contents unspecified) for its own purposes — bytes that
    // parse but carry none of our count fields must yield None, or keepBlob
    // prunes the blob as provably-empty (silent total data loss)
    assert(FrameScanner.parseStats(Array.emptyByteArray).isEmpty,
      "empty indexdata parsed as all-zero counts")
    val idOnly = new ProtoWriter
    idOnly.sint(5, 1L); idOnly.sint(6, 99L) // ids but no counts
    assert(FrameScanner.parseStats(idOnly.toBytes).isEmpty,
      "count-less indexdata parsed as all-zero counts")
    // negative (malformed) counts are poison, not data
    val neg = new ProtoWriter
    neg.varint(1, -5L)
    assert(FrameScanner.parseStats(neg.toBytes).isEmpty)
    // ours still parse
    val ours = new ProtoWriter
    ours.varint(1, 3L); ours.varint(2, 0L); ours.varint(3, 0L); ours.varint(4, 0L)
    assert(FrameScanner.parseStats(ours.toBytes).map(_.nodes) === Some(3L))
  }

  test("out-of-range relation member_type maps to empty, never crashes") {
    assert(PbfCodec.memberTypeName(0) === "node")
    assert(PbfCodec.memberTypeName(2) === "relation")
    assert(PbfCodec.memberTypeName(3) === "")
    assert(PbfCodec.memberTypeName(-56) === "") // 200 truncated to byte
  }

  test("Info without timestamp decodes ts-absent, never a fabricated 1970 epoch") {
    // hand-crafted dense block: one node whose DenseInfo carries version/
    // changeset/uid/user but NO timestamps array (all DenseInfo arrays are
    // optional per spec — osmium drops timestamps under some flags)
    val st = new ProtoWriter
    st.bytes(1, "".getBytes("UTF-8")) // index 0 = empty sentinel
    val di = new ProtoWriter
    di.packedVarints(1, Seq(3L))       // version
    di.packedDeltaSints(3, Seq(7L))    // changeset
    di.packedDeltaSints(4, Seq(1L))    // uid
    di.packedDeltaSints(5, Seq(0L))    // user_sid -> ""
    val dn = new ProtoWriter
    dn.packedDeltaSints(1, Seq(42L))   // id
    dn.message(5, di)
    dn.packedDeltaSints(8, Seq(0L))    // lat raw
    dn.packedDeltaSints(9, Seq(0L))    // lon raw
    val g = new ProtoWriter
    g.message(2, dn)
    val block = new ProtoWriter
    block.message(1, st)
    block.message(2, g)
    var seen = 0
    PbfCodec.decodeBlock(block.toBytes, new PbfCodec.ElementHandler {
      override def onNode(id: Long, latNd: Long, lonNd: Long, lat: Double, lon: Double,
          tagK: Array[String], tagV: Array[String], info: PbfCodec.InfoData): Unit = {
        seen += 1
        assert(id === 42L)
        assert(info != null && info.version === 3 && !info.tsSeen,
          "omitted DenseInfo timestamp must decode as absent")
      }
      override def onWay(id: Long, refs: Array[Long], tagK: Array[String],
          tagV: Array[String], info: PbfCodec.InfoData): Unit = ()
      override def onRelation(id: Long, memids: Array[Long], roles: Array[String],
          types: Array[Byte], tagK: Array[String], tagV: Array[String],
          info: PbfCodec.InfoData): Unit = ()
      override def onChangeSet(id: Long, tagK: Array[String], tagV: Array[String]): Unit = ()
    })
    assert(seen === 1)
  }

  test("null-ts info round-trips through writer and local reader (no 1970, no NPE)") {
    import graft.osmpbf.model.{OsmInfo, OsmNode, OsmWay}
    val path = tmpFile(".pbf")
    val ts = new java.sql.Timestamp(1700000000000L)
    val withTs = OsmNode(1L, 1000L, 2000L, 1e-6, 2e-6, Map.empty,
      Some(OsmInfo(2, ts, 5L, 7, "u", true)), 0L)
    val nullTs = OsmNode(2L, 3000L, 4000L, 3e-6, 4e-6, Map.empty,
      Some(OsmInfo(3, null, 6L, 8, "v", true)), 0L) // used to NPE in infoMsg
    val noInfo = OsmNode(3L, 5000L, 6000L, 5e-6, 6e-6, Map.empty, None, 0L)
    val way = OsmWay(10L, Seq(1L, 2L), Map.empty,
      Some(OsmInfo(1, null, 9L, 7, "w", true)), 0L) // sparse infoMsg path
    val w = PbfWriter(path)
    Seq(withTs, nullTs, noInfo).foreach(w.addNode)
    w.addWay(way)
    w.close()
    val dec = PbfFile.read(path)
    val byId = dec.nodes.map(n => n.id -> n.info).toMap
    assert(byId(1L).get.ts === ts)
    assert(byId(2L).isDefined && byId(2L).get.ts === null,
      "null ts must survive the round trip, not become a 1970 epoch")
    assert(byId(2L).get.version === 3 && byId(2L).get.changeset === 6L)
    assert(byId(3L).isEmpty)
    assert(dec.ways.head.info.get.ts === null)
  }

  test("changeset tags survive the local PbfFile reader (Collector parity with Spark rows)") {
    val path = java.nio.file.Files.createTempDirectory("cs").toString + "/cs.osm.pbf"
    val w = graft.osmpbf.codec.PbfWriter(path)
    w.writeHeader(graft.osmpbf.model.HeaderMeta(Seq("OsmSchema-V0.6"), Nil, "t", "t",
      None, None, None, None))
    w.addChangeSet(graft.osmpbf.model.OsmChangeSet(7L, Map("created_by" -> "graft"), 0L))
    w.close()
    val decoded = PbfFile.read(path)
    assert(decoded.changesets.map(c => c.id -> c.tags) === Seq(7L -> Map("created_by" -> "graft")))
  }
}
