package graft.osmpbf.model

/** Decoded OSM element model — the Spark-facing logical schema
  * (FIXTURES.md §B). Field names are snake_case so `Dataset[T]` column
  * names line up with the DataFrame schema of the `osmpbf` source.
  *
  * Semantics mirror the reference's data model:
  *   - ids/coords: /root/reference/src/blocks/primitives/node.rs:5-26
  *     (lat/lon stored in nanodegrees; degrees = nd * 1e-9, node.rs:62-70)
  *   - info: /root/reference/src/blocks/primitives/info.rs:3-33
  *     (visible defaults to true)
  *   - way refs: way.rs:5-24 (delta-encoded on the wire, resolved here)
  *   - relation members: relation.rs:5-33, member_type.rs:4-8
  */
final case class OsmInfo(
    version: Int,
    ts: java.sql.Timestamp,
    changeset: Long,
    uid: Int,
    user: String,
    visible: Boolean)

final case class OsmNode(
    id: Long,
    lat_nd: Long,
    lon_nd: Long,
    lat: Double,
    lon: Double,
    tags: Map[String, String],
    info: Option[OsmInfo],
    blob_offset: Long)

final case class OsmWay(
    id: Long,
    refs: Seq[Long],
    tags: Map[String, String],
    info: Option[OsmInfo],
    blob_offset: Long)

final case class RelMember(memid: Long, role: String, mtype: String)

final case class OsmRelation(
    id: Long,
    members: Seq[RelMember],
    tags: Map[String, String],
    info: Option[OsmInfo],
    blob_offset: Long)

final case class OsmChangeSet(
    id: Long,
    tags: Map[String, String],
    blob_offset: Long)

/** OSMHeader metadata (reference: header_block.rs:7-31; bbox in nanodeg). */
final case class HeaderMeta(
    required_features: Seq[String],
    optional_features: Seq[String],
    writing_program: String,
    source: String,
    bbox: Option[HeaderBBox],
    replication_timestamp: Option[Long],
    replication_sequence: Option[Long],
    replication_base_url: Option[String])

final case class HeaderBBox(left: Long, right: Long, top: Long, bottom: Long)

/** One framed blob's index entry (reference BlobIndex,
  * indexed_reader.rs:7-28) — unlike the reference, the per-type element
  * counts ARE populated when `withStats` indexing is used, so blob-level
  * pushdown actually works (the reference never fills them:
  * indexed_reader.rs:150-151, a latent skip-everything bug we do not copy).
  */
final case class BlobPointer(
    path: String,
    blobType: String,
    headerOffset: Long, // file offset of the 4-byte BE length prefix
    dataOffset: Long, // file offset of the Blob message payload
    dataSize: Int, // size of the Blob message payload
    nodeCount: Long = -1L, // -1 = unknown (conservatively include)
    wayCount: Long = -1L,
    relationCount: Long = -1L,
    changesetCount: Long = -1L,
    minId: Long = Long.MinValue,
    maxId: Long = Long.MaxValue)

/** Per-blob decoded batch in struct-of-arrays form (decode IR; never a
  * user-facing table — SURVEY.md §1.1). */
final class DecodedBlock(
    val nodes: Array[OsmNode],
    val ways: Array[OsmWay],
    val relations: Array[OsmRelation],
    val changesets: Array[OsmChangeSet])
