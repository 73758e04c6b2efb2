package graft.fixtures

import graft.osmpbf.codec.PbfWriter
import graft.osmpbf.model._

import java.sql.Timestamp
import scala.collection.mutable
import scala.util.Random

/** Deterministic synthetic OSM world (FIXTURES.md §B content rule, seed=42):
  * nodes on a jittered grid inside city-like clusters (the hot cells the
  * skew tests need), ways = closed rectangles around cluster centers tagged
  * building=yes | landuse=residential | highway=primary, plus open highway
  * polylines, and one multipolygon relation (outer+inner ring) per cluster.
  *
  * All coordinates are multiples of the writer granularity (default 100 nd)
  * so encode∘decode is exact. Ground truth is kept in memory so tests can
  * assert byte-exact counts, tags and coordinates after the round trip
  * (north_star decode-parity requirement).
  */
object OsmWorld {

  final case class World(
      nodes: Vector[OsmNode],
      ways: Vector[OsmWay],
      relations: Vector[OsmRelation],
      clusterCenters: Vector[(Double, Double)]) // (lon, lat)

  /** Snap degrees to the 100-nanodegree grid. */
  private def snapNd(deg: Double): Long = math.round(deg * 1e7) * 100L

  def generate(seed: Long = 42L, nClusters: Int = 8, nodesPerCluster: Int = 200,
      withInfo: Boolean = true): World = {
    val rnd = new Random(seed)
    val nodes = Vector.newBuilder[OsmNode]
    val ways = Vector.newBuilder[OsmWay]
    val relations = Vector.newBuilder[OsmRelation]
    val centers = Vector.newBuilder[(Double, Double)]

    var nodeId = 1L
    var wayId = 100001L
    var relId = 900001L
    val tagCycle = Vector("building" -> "yes", "landuse" -> "residential", "highway" -> "primary")

    for (c <- 0 until nClusters) {
      val cLon = -120.0 + rnd.nextDouble() * 240.0
      val cLat = -50.0 + rnd.nextDouble() * 100.0
      centers += ((cLon, cLat))

      // grid nodes with jitter; skew: cluster 0 gets 4x density
      val n = if (c == 0) nodesPerCluster * 4 else nodesPerCluster
      val side = math.max(2, math.sqrt(n.toDouble).toInt)
      val clusterFirstNode = nodeId
      for (i <- 0 until n) {
        val gx = i % side
        val gy = i / side
        val lon = cLon + (gx - side / 2) * 0.01 + (rnd.nextDouble() - 0.5) * 0.002
        val lat = cLat + (gy - side / 2) * 0.01 + (rnd.nextDouble() - 0.5) * 0.002
        val latNd = snapNd(math.max(-89.99, math.min(89.99, lat)))
        val lonNd = snapNd(math.max(-179.99, math.min(179.99, lon)))
        val tags =
          if (i % 17 == 0) Map("amenity" -> "cafe", "name" -> s"cafe_${c}_$i")
          else if (i % 23 == 0) Map("shop" -> "bakery")
          else Map.empty[String, String]
        val info = if (withInfo)
          Some(OsmInfo(1 + (i % 5), new Timestamp(1500000000000L + i * 1000L),
            1000L + i, 7 + (i % 3), s"user${i % 4}", visible = true))
        else None
        nodes += OsmNode(nodeId, latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, tags, info, 0L)
        nodeId += 1
      }

      // closed rectangle ways (buildings etc.) around sub-centers
      val nRects = math.max(2, n / 40)
      for (rI <- 0 until nRects) {
        val bx = cLon + (rnd.nextDouble() - 0.5) * 0.15
        val by = cLat + (rnd.nextDouble() - 0.5) * 0.15
        val w = 0.004 + rnd.nextDouble() * 0.02
        val h = 0.004 + rnd.nextDouble() * 0.02
        val corners = Seq((bx - w, by - h), (bx + w, by - h), (bx + w, by + h), (bx - w, by + h))
        val cornerIds = corners.map { case (lon, lat) =>
          val latNd = snapNd(lat); val lonNd = snapNd(lon)
          nodes += OsmNode(nodeId, latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, Map.empty, None, 0L)
          nodeId += 1
          nodeId - 1
        }
        val tag = tagCycle(rI % tagCycle.size)
        ways += OsmWay(wayId, cornerIds :+ cornerIds.head, Map(tag), None, 0L)
        wayId += 1
      }

      // open highway polyline through the cluster's first nodes
      val span = math.min(8, n)
      ways += OsmWay(wayId, (0 until span).map(clusterFirstNode + _),
        Map("highway" -> "primary", "name" -> s"route_$c"), None, 0L)
      wayId += 1

      // multipolygon: outer + inner ring ways
      val (outerId, innerId) = (wayId, wayId + 1)
      for ((scale, wid) <- Seq((0.1, outerId), (0.04, innerId))) {
        val pts = Seq((cLon - scale, cLat - scale), (cLon + scale, cLat - scale),
          (cLon + scale, cLat + scale), (cLon - scale, cLat + scale))
        val ids = pts.map { case (lon, lat) =>
          val latNd = snapNd(lat); val lonNd = snapNd(lon)
          nodes += OsmNode(nodeId, latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, Map.empty, None, 0L)
          nodeId += 1
          nodeId - 1
        }
        ways += OsmWay(wid, ids :+ ids.head, Map.empty, None, 0L)
      }
      wayId += 2
      val zoneRelId = relId
      relations += OsmRelation(zoneRelId,
        Seq(RelMember(outerId, "outer", "way"), RelMember(innerId, "inner", "way")),
        Map("type" -> "multipolygon", "name" -> s"zone_$c"), None, 0L)
      relId += 1

      // super-relation (relation-of-relations, member_type Relation): its
      // own big outer ring way PLUS the zone relation — depth-2 assembly
      // resolves the zone's outer+inner rings into the super polygon
      val superOuterId = wayId
      val sScale = 0.16
      val sPts = Seq((cLon - sScale, cLat - sScale), (cLon + sScale, cLat - sScale),
        (cLon + sScale, cLat + sScale), (cLon - sScale, cLat + sScale))
      val sIds = sPts.map { case (lon, lat) =>
        val latNd = snapNd(lat); val lonNd = snapNd(lon)
        nodes += OsmNode(nodeId, latNd, lonNd, latNd * 1e-9, lonNd * 1e-9, Map.empty, None, 0L)
        nodeId += 1
        nodeId - 1
      }
      ways += OsmWay(superOuterId, sIds :+ sIds.head, Map.empty, None, 0L)
      wayId += 1
      relations += OsmRelation(relId,
        Seq(RelMember(superOuterId, "outer", "way"), RelMember(zoneRelId, "", "relation")),
        Map("type" -> "multipolygon", "name" -> s"super_zone_$c"), None, 0L)
      relId += 1
    }
    World(nodes.result(), ways.result(), relations.result(), centers.result())
  }

  /** Write a world to a .osm.pbf file; returns the world (ground truth). */
  def writePbf(path: String, world: World, granularity: Long = 100L,
      latOffset: Long = 0L, lonOffset: Long = 0L, compress: Boolean = true,
      dense: Boolean = true, elementsPerBlock: Int = 4000): World = {
    val w = PbfWriter(path, granularity = granularity, latOffset = latOffset,
      lonOffset = lonOffset, compress = compress, dense = dense,
      elementsPerBlock = elementsPerBlock)
    val allLat = world.nodes.map(_.lat_nd)
    val allLon = world.nodes.map(_.lon_nd)
    w.writeHeader(HeaderMeta(
      Seq("OsmSchema-V0.6", "DenseNodes"), Nil, "graft-osm-world", "synthetic",
      Some(HeaderBBox(allLon.min, allLon.max, allLat.max, allLat.min)),
      Some(1700000000L), Some(4242L), Some("https://example.invalid/replication")))
    world.nodes.foreach(w.addNode)
    world.ways.foreach(w.addWay)
    world.relations.foreach(w.addRelation)
    w.close()
    world
  }

  /** Bumped whenever `generate` changes content, so stale cached fixture
    * files (which live across sessions under /tmp) can never mismatch the
    * in-memory ground truth. v2: super-relations (depth-2 multipolygons). */
  final val FixtureVersion = 2

  /** Generate-and-write with a per-(seed,size) cached file under tmpDir, so
    * repeated test/bench runs reuse the fixture. Returns (path, world). */
  def cachedPbf(tmpDir: String, seed: Long, nClusters: Int, nodesPerCluster: Int): (String, World) = {
    val path = s"$tmpDir/osmworld_${seed}_${nClusters}_${nodesPerCluster}_v$FixtureVersion.osm.pbf"
    val world = generate(seed, nClusters, nodesPerCluster)
    val f = new java.io.File(path)
    if (!f.exists()) {
      new java.io.File(tmpDir).mkdirs()
      writePbf(path + ".tmp", world)
      new java.io.File(path + ".tmp").renameTo(f)
    }
    (path, world)
  }
}
