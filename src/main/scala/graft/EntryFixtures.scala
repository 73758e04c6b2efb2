package graft

import graft.fixtures.OsmWorld
import graft.osmpbf.source.OsmPbf
import graft.spatial.geom.Assembly
import graft.tiles.Images

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixture derivations for SparkEntry queries.
  *
  * Spatial queries need points the DuckDB oracle can reproduce, so lon/lat
  * are derived arithmetically from driver-table key columns (FIXTURES.md §D
  * rule). PBF-side queries read a deterministic .osm.pbf generated per
  * scale factor and cached under java.io.tmpdir (oracle-omitted: DuckDB
  * cannot read PBF; their correctness gate is the ScalaTest round-trip
  * suites).
  */
object EntryFixtures {

  /** scale parsed from ".../sf0.01" → 0.01 (defaults to 0.001). */
  def scaleOf(sfDir: String): Double = {
    val m = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
    m.map(_.group(1).toDouble).getOrElse(0.001)
  }

  private def fixtureDir: String = {
    val d = sys.props("java.io.tmpdir") + "/graft-fixtures"
    new java.io.File(d).mkdirs()
    d
  }

  /** Deterministic world sized by sf: clusters fixed, nodes grow sublinearly
    * (decode correctness does not need sf0.1 to be huge; Bench generates its
    * own large worlds). */
  def world(sfDir: String): (String, OsmWorld.World) = {
    val n = math.max(120, math.min(2000, (scaleOf(sfDir) * 20000).toInt))
    OsmWorld.cachedPbf(fixtureDir, seed = 42, nClusters = 6, nodesPerCluster = n)
  }

  def osmTables(spark: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) = {
    val (path, _) = world(sfDir)
    (OsmPbf.nodes(spark, path).toDF(), OsmPbf.ways(spark, path).toDF(),
      OsmPbf.relations(spark, path).toDF())
  }

  def polygons(spark: SparkSession, sfDir: String): DataFrame = {
    val (nodes, ways, relations) = osmTables(spark, sfDir)
    Assembly.polygons(nodes, ways, relations)
  }

  /** Materialized images-fixture path, sized by sf and written on first
    * use (PNG encode is the slow part; amortized across Verify/Bench
    * runs). Exposed so the streaming query can replay the same files as a
    * file stream; [[images]] is the batch view over it. */
  def imagesPath(spark: SparkSession, sfDir: String): String = {
    val n = math.max(500, math.min(50000, (scaleOf(sfDir) * 500000).toInt))
    val (_, w) = world(sfDir)
    val path = s"$fixtureDir/images_$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      Images.synthesize(spark, n, w.clusterCenters, 8)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def images(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(imagesPath(spark, sfDir))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ------------------------------------------------------------------ truth
  // Driver-side ground truth from the fixture generator, joined back into
  // the p1–p4 contract queries as self-certifying `ok` columns (the e2
  // pattern): DuckDB cannot read .osm.pbf, so the driver's check for these
  // queries is rows-only — but every output row carrying its own verdict
  // against the generator's in-memory World gives the parquet dump a
  // value-level signal anyway (and EntrySelfCertSpec asserts all-ok).
  // Truth sets are fixture-sized (≤ thousands of rows), built locally.

  /** Expected element count per kind (p1). */
  def p1Truth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, w) = world(sfDir)
    Seq(("node", w.nodes.size.toLong), ("way", w.ways.size.toLong),
      ("relation", w.relations.size.toLong)).toDF("kind", "expected")
  }

  /** Expected (name, nanodegree coords) of every amenity-tagged node (p2). */
  def p2Truth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, w) = world(sfDir)
    w.nodes.filter(_.tags.contains("amenity"))
      .map(n => (n.id, n.tags.get("name").orNull, n.lat_nd, n.lon_nd))
      .toDF("id", "exp_name", "exp_lat_nd", "exp_lon_nd")
  }

  /** Expected (ref count, closed flag) of every way (p3). */
  def p3Truth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, w) = world(sfDir)
    w.ways.map(wy => (wy.id, wy.refs.size,
      wy.refs.size > 3 && wy.refs.head == wy.refs.last))
      .toDF("id", "exp_n_pts", "exp_closed")
  }

  /** Expected (ring count, bbox extremes) of every assembled polygon (p4):
    * closed polygon-tagged ways (1 ring) plus multipolygon relations whose
    * ring count is their resolved distinct (way, role) member set — direct
    * way members and, for super-relations, the referenced relation's way
    * members (Assembly's depth-2 contract). Coordinates come from the same
    * nanodegree grid the decoder reproduces exactly, so double equality
    * against the assembled bbox is well-defined. */
  def p4Truth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, w) = world(sfDir)
    val coord = w.nodes.map(n => n.id -> ((n.lon, n.lat))).toMap
    val wayById = w.ways.map(wy => wy.id -> wy).toMap
    val relById = w.relations.map(r => r.id -> r).toMap
    val polyKeys = Seq("building", "landuse", "natural", "leisure", "amenity")
    val wayRows = w.ways
      .filter(wy => wy.refs.size > 3 && wy.refs.head == wy.refs.last &&
        polyKeys.exists(wy.tags.contains))
      .map { wy =>
        val pts = wy.refs.map(coord)
        ("way", wy.id, 1, pts.map(_._1).min, pts.map(_._2).max)
      }
    val relRows = w.relations
      .filter(_.tags.get("type").contains("multipolygon"))
      .map { r =>
        val direct = r.members
          .filter(m => m.mtype == "way" && (m.role == "outer" || m.role == "inner"))
          .map(m => (m.memid, m.role))
        val viaSub = r.members.filter(_.mtype == "relation")
          .flatMap(m => relById.get(m.memid)).flatMap(_.members
            .filter(sm => sm.mtype == "way" && (sm.role == "outer" || sm.role == "inner"))
            .map(sm => (sm.memid, sm.role)))
        val memberWays = (direct ++ viaSub).distinct
        val pts = memberWays.flatMap { case (wid, _) => wayById(wid).refs.map(coord) }
        ("relation", r.id, memberWays.size, pts.map(_._1).min, pts.map(_._2).max)
      }
    (wayRows ++ relRows)
      .toDF("src", "id", "exp_n_rings", "exp_min_lon", "exp_max_lat")
  }

  /** Deterministic, SQL-reproducible point derivation from lineitem. */
  def lineitemPoints(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .withColumn("lon", (col("l_partkey") * 17 % 3600).cast("double") / 10.0 - 180.0 +
        col("l_linenumber").cast("double") / 1000.0)
      .withColumn("lat", (col("l_suppkey") * 161 % 1600).cast("double") / 10.0 - 80.0 +
        (col("l_orderkey") % 100).cast("double") / 1000.0)

  val lineitemPointsSql: String =
    """SELECT l.*,
      |  (l_partkey * 17 % 3600) / 10.0 - 180.0 + l_linenumber / 1000.0 AS lon,
      |  (l_suppkey * 161 % 1600) / 10.0 - 80.0 + (l_orderkey % 100) / 1000.0 AS lat
      |FROM lineitem l""".stripMargin

  /** POI derivation from part (used by the kNN oracle). */
  def partPois(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "part")
      .withColumn("poi_lon", (col("p_partkey") * 13 % 3600).cast("double") / 10.0 - 180.0)
      .withColumn("poi_lat", (col("p_partkey") * 29 % 1600).cast("double") / 10.0 - 80.0)
      .select(col("p_partkey").as("poi_id"), col("poi_lon").as("lon"), col("poi_lat").as("lat"))

  val partPoisSql: String =
    """SELECT p_partkey AS poi_id,
      |  (p_partkey * 13 % 3600) / 10.0 - 180.0 AS poi_lon,
      |  (p_partkey * 29 % 1600) / 10.0 - 80.0 AS poi_lat
      |FROM part""".stripMargin

  /** Rectangle "polygons" from nation (PIP oracle-expressible as bbox
    * containment; edges at .x5 offsets so grid-derived points never sit on
    * a boundary). */
  def nationRects(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")
      .withColumn("min_lon", (col("n_nationkey") * 101 % 300).cast("double") - 150.0 + 0.0505)
      .withColumn("min_lat", (col("n_nationkey") * 53 % 140).cast("double") - 70.0 + 0.0505)
      .withColumn("max_lon", col("min_lon") + 4.0)
      .withColumn("max_lat", col("min_lat") + 3.0)
      .select(col("n_nationkey").as("rect_id"), col("min_lon"), col("min_lat"),
        col("max_lon"), col("max_lat"))

  val nationRectsSql: String =
    """SELECT n_nationkey AS rect_id,
      |  (n_nationkey * 101 % 300) - 150.0 + 0.0505 AS min_lon,
      |  (n_nationkey * 53 % 140) - 70.0 + 0.0505 AS min_lat,
      |  (n_nationkey * 101 % 300) - 150.0 + 0.0505 + 4.0 AS max_lon,
      |  (n_nationkey * 53 % 140) - 70.0 + 0.0505 + 3.0 AS max_lat
      |FROM nation""".stripMargin

  /** nation rectangles as the engine's polygon-table shape (rings + bbox). */
  def nationRectPolys(spark: SparkSession, sfDir: String): DataFrame =
    nationRects(spark, sfDir)
      .withColumn("rings", array(array(
        struct(col("min_lon").as("lon"), col("min_lat").as("lat")),
        struct(col("max_lon").as("lon"), col("min_lat").as("lat")),
        struct(col("max_lon").as("lon"), col("max_lat").as("lat")),
        struct(col("min_lon").as("lon"), col("max_lat").as("lat")))))
      .withColumn("bbox", struct(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")))
      .withColumn("tags", map(lit("kind"), lit("rect")))
      .select(col("rect_id").as("id"), col("rings"), col("tags"), col("bbox"))

  /** SQL fragment for the packed cell id (mirrors CellMath.cellOf). */
  def cellSql(lonExpr: String, latExpr: String, res: Int): String = {
    val n = 1 << res
    s"""((CAST($res AS BIGINT) << 58)
       | | (CAST(LEAST(GREATEST(FLOOR((($lonExpr) + 180.0) / 360.0 * $n), 0), ${n - 1}) AS BIGINT) << 29)
       | | CAST(LEAST(GREATEST(FLOOR((90.0 - ($latExpr)) / 180.0 * $n), 0), ${n - 1}) AS BIGINT))""".stripMargin.replace("\n", " ")
  }
}
