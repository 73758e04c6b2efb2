package graft.osmpbf.codec

import graft.osmpbf.model._

import org.apache.hadoop.conf.Configuration
import scala.collection.mutable

/** Single-JVM convenience reader over a .osm.pbf file — the analog of the
  * reference's `Reader::for_each` / `collect_filtered` entry points
  * (reader.rs:101-141, :223-231), used for tests and ground truth. The
  * distributed path is the `osmpbf` DataSource (graft.osmpbf.source).
  */
object PbfFile {

  final case class Decoded(
      header: Option[HeaderMeta],
      nodes: Vector[OsmNode],
      ways: Vector[OsmWay],
      relations: Vector[OsmRelation],
      changesets: Vector[OsmChangeSet],
      blobCount: Int,
      errorCount: Int)

  /** Handler materializing model case classes (shared with the Spark path
    * when typed Datasets are requested). */
  final class Collector(blobOffset: Long) extends PbfCodec.ElementHandler {
    val nodes = mutable.ArrayBuffer.empty[OsmNode]
    val ways = mutable.ArrayBuffer.empty[OsmWay]
    val relations = mutable.ArrayBuffer.empty[OsmRelation]
    val changesets = mutable.ArrayBuffer.empty[OsmChangeSet]

    private def mkInfo(i: PbfCodec.InfoData): Option[OsmInfo] =
      if (i == null) None
      // omitted timestamp stays null — Spark-row parity (the DSv2 reader
      // surfaces it as NULL, never a fabricated 1970 epoch)
      else Some(OsmInfo(i.version,
        if (i.tsSeen) new java.sql.Timestamp(i.tsMillis) else null,
        i.changeset, i.uid, i.user, i.visible))

    private def mkTags(k: Array[String], v: Array[String]): Map[String, String] = {
      if (k.isEmpty) Map.empty
      else {
        val b = Map.newBuilder[String, String]
        var i = 0
        while (i < k.length) { b += k(i) -> v(i); i += 1 }
        b.result()
      }
    }

    override def onNode(id: Long, latNd: Long, lonNd: Long, lat: Double, lon: Double,
        tagK: Array[String], tagV: Array[String], info: PbfCodec.InfoData): Unit =
      nodes += OsmNode(id, latNd, lonNd, lat, lon, mkTags(tagK, tagV), mkInfo(info), blobOffset)

    override def onWay(id: Long, refs: Array[Long],
        tagK: Array[String], tagV: Array[String], info: PbfCodec.InfoData): Unit =
      ways += OsmWay(id, refs.toSeq, mkTags(tagK, tagV), mkInfo(info), blobOffset)

    override def onRelation(id: Long, memids: Array[Long], roles: Array[String], types: Array[Byte],
        tagK: Array[String], tagV: Array[String], info: PbfCodec.InfoData): Unit = {
      val members = Array.tabulate(memids.length) { i =>
        RelMember(memids(i), roles(i), PbfCodec.memberTypeName(types(i).toInt))
      }
      relations += OsmRelation(id, members.toSeq, mkTags(tagK, tagV), mkInfo(info), blobOffset)
    }

    override def onChangeSet(id: Long, tagK: Array[String], tagV: Array[String]): Unit =
      changesets += OsmChangeSet(id, mkTags(tagK, tagV), blobOffset)
  }

  /** Full decode; bad blobs are counted and skipped, not fatal
    * (reference reader.rs:113-119 fault-tolerance semantics). */
  def read(path: String, kinds: Int = PbfCodec.KindAll,
      conf: Configuration = new Configuration()): Decoded = {
    val scanned = FrameScanner.scan(path, conf)
    val all = new Collector(0L)
    var errors = 0
    scanned.blobs.foreach { ptr =>
      if (ptr.blobType == "OSMData") {
        try {
          val payload = FrameScanner.readBlobPayload(ptr, conf)
          val block = PbfCodec.decodeBlobPayload(payload, 0, payload.length)
          val c = new Collector(ptr.headerOffset)
          PbfCodec.decodeBlock(block, c, kinds)
          all.nodes ++= c.nodes
          all.ways ++= c.ways
          all.relations ++= c.relations
          all.changesets ++= c.changesets
        } catch { case _: Exception => errors += 1 }
      }
    }
    Decoded(scanned.header, all.nodes.toVector, all.ways.toVector,
      all.relations.toVector, all.changesets.toVector, scanned.blobs.size, errors)
  }
}
