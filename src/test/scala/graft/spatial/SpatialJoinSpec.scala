package graft.spatial

import graft.SparkTestBase
import graft.fixtures.OsmWorld
import graft.osmpbf.source.OsmPbf
import graft.spatial.cell.GeomEval
import graft.spatial.geom.Assembly
import graft.spatial.join.{KnnCand, KnnCandIn, SpatialJoin, TopKAgg}
import graft.tiles.{Images, Tiles}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinSpec extends AnyFunSuite with SparkTestBase {

  private lazy val (pbfPath, world) = OsmWorld.cachedPbf(tmpDir, seed = 42, nClusters = 4, nodesPerCluster = 100)
  private lazy val nodes = OsmPbf.nodes(spark, pbfPath).toDF().cache()
  private lazy val ways = OsmPbf.ways(spark, pbfPath).toDF().cache()
  private lazy val relations = OsmPbf.relations(spark, pbfPath).toDF().cache()
  private lazy val polys = Assembly.polygons(nodes, ways, relations).cache()

  // ground-truth polygon set computed driver-side from the world fixture
  private lazy val expectedPolys: Map[(String, Long), Seq[Seq[(Double, Double)]]] = {
    val nodeById = world.nodes.map(n => n.id -> (n.lon, n.lat)).toMap
    val wayById = world.ways.map(w => w.id -> w).toMap
    val fromWays = world.ways
      .filter(w => w.refs.head == w.refs.last && w.refs.size > 3 &&
        Seq("building", "landuse", "natural", "leisure", "amenity").exists(w.tags.contains))
      .map(w => ("way", w.id) -> Seq(w.refs.map(nodeById)))
    val relById = world.relations.map(r => r.id -> r).toMap
    val fromRels = world.relations
      .filter(_.tags.get("type").contains("multipolygon"))
      .map { r =>
        // depth-2 resolution mirror: way members directly, plus the way
        // members (with their own roles) of relation-typed members
        val resolved = r.members.flatMap {
          case m if m.mtype == "way" && Seq("outer", "inner").contains(m.role) => Seq(m)
          case m if m.mtype == "relation" =>
            relById.get(m.memid).toSeq.flatMap(_.members
              .filter(s => s.mtype == "way" && Seq("outer", "inner").contains(s.role)))
          case _ => Seq.empty
        }.distinctBy(m => (m.memid, m.role))
        val rings = resolved
          .sortBy(m => (if (m.role == "outer") 0 else 1, m.memid))
          .map(m => wayById(m.memid).refs.map(nodeById).toSeq)
        ("relation", r.id) -> rings.toSeq
      }
    (fromWays ++ fromRels).toMap
  }

  test("J1 way assembly: pts match node coordinates in ref order") {
    val got = Assembly.wayGeometries(nodes, ways).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getDouble(1))))
      .toMap
    val nodeById = world.nodes.map(n => n.id -> (n.lon, n.lat)).toMap
    world.ways.foreach { w =>
      assert(got(w.id) === w.refs.map(nodeById), s"way ${w.id}")
    }
  }

  test("J1 closed flag") {
    val closed = Assembly.wayGeometries(nodes, ways).select("id", "closed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    world.ways.foreach { w =>
      assert(closed(w.id) === (w.refs.size > 3 && w.refs.head == w.refs.last), s"way ${w.id}")
    }
  }

  test("J2 polygon assembly matches ground truth (incl. multipolygon rings)") {
    val got = polys.collect().map { r =>
      val rings = r.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](r.fieldIndex("rings"))
        .map(_.map(p => (p.getDouble(0), p.getDouble(1))).toSeq)
      ((r.getAs[String]("src"), r.getAs[Long]("id")), rings)
    }.toMap
    assert(got.keySet === expectedPolys.keySet)
    expectedPolys.foreach { case (k, expRings) =>
      assert(got(k).map(_.toSeq).toSeq === expRings.map(_.toSeq).toSeq, s"polygon $k")
    }
  }

  test("J4 kNN with empty points returns an empty typed result, not an NPE") {
    import spark.implicits._
    val noPts = Seq.empty[(Long, Double, Double)].toDF("pt_id", "lon", "lat")
    val pois = Seq((1L, 0.0, 0.0), (2L, 1.0, 1.0)).toDF("poi_id", "lon", "lat")
    val out = SpatialJoin.knnJoin(noPts, pois, k = 1)
    assert(out.columns.toSeq === Seq("pt_id", "poi_id", "dist_m", "rank"))
    assert(out.count() === 0)
  }

  test("J4 hostile inputs: NaN distances rank last, null coords drop, k and res validated") {
    import spark.implicits._
    // TopKAgg: raw </== comparisons are always false against NaN, which
    // used to prepend a NaN candidate at rank 1 — the window oracle sorts
    // NaN last
    val agg = new TopKAgg(2)
    val buf = Seq(KnnCandIn(Double.NaN, 1L), KnnCandIn(5.0, 2L), KnnCandIn(7.0, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_.id) === Seq(2L, 3L), s"NaN outranked real distances: $buf")
    // round-6: null candidates (the loop's keep-alive rows / unmatched
    // left probes) are skipped, never inserted
    assert(agg.reduce(buf, KnnCandIn(null, null)) === buf)
    assert(agg.reduce(agg.zero, KnnCandIn(null, null)) === agg.zero)
    assert(agg.merge(Seq(KnnCand(Double.NaN, 9L)), Seq(KnnCand(1.0, 2L)))
      .head.id === 2L)
    intercept[IllegalArgumentException](new TopKAgg(0))
    intercept[IllegalArgumentException](
      SpatialJoin.knnJoin(Seq((1L, 0.0, 0.0)).toDF("pt_id", "lon", "lat"),
        Seq((1L, 0.0, 0.0)).toDF("poi_id", "lon", "lat"), k = 0))
    // null coordinates drop instead of coercing to 0.0 (Gulf of Guinea)
    val pts = Seq((1L, Option(0.5), Option(0.5)), (2L, Option.empty[Double], Option(1.0)))
      .toDF("pt_id", "lon", "lat")
    val pois = Seq((10L, Option(0.4), Option(0.4)), (11L, Option.empty[Double], Option(0.0)))
      .toDF("poi_id", "lon", "lat")
    val knn = SpatialJoin.knnJoin(pts, pois, k = 1).collect()
    assert(knn.map(_.getLong(0)).toSet === Set(1L), "null-coordinate point must drop")
    assert(knn.head.getLong(1) === 10L, "null-coordinate POI must never match")
    // a prepared polygon side from the WRONG resolution fails fast instead
    // of silently joining nothing
    val pc = SpatialJoin.preparedPolygonCells(polys, res = 10)
    intercept[IllegalArgumentException](
      SpatialJoin.pipJoin(pts.where(col("lon").isNotNull), polys, res = 12,
        preparedCells = Some(pc)))
  }

  test("J2 super-relation (relation-of-relations) resolves to depth 2 with all rings") {
    // every super_zone relation must assemble: its own outer ring + the
    // referenced zone relation's outer AND inner rings = 3 rings, 2 outer
    val supers = world.relations.filter(_.tags.get("name").exists(_.startsWith("super_zone")))
    assert(supers.nonEmpty && supers.forall(_.members.exists(_.mtype == "relation")))
    val got = polys.where(col("src") === "relation").collect()
      .map(r => r.getAs[Long]("id") ->
        r.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](r.fieldIndex("rings")).size)
      .toMap
    supers.foreach { s =>
      assert(got(s.id) === 3, s"super-relation ${s.id} ring count")
    }
    // and a cycle cannot loop: a self-referencing multipolygon resolves to
    // its own way members exactly once
    import spark.implicits._
    val selfRel = Seq((1L, Map("type" -> "multipolygon"),
      Seq((101L, "outer", "way"), (1L, "", "relation")))).toDF("id", "tags", "m")
      .select(col("id"), col("tags"), expr(
        "transform(m, x -> struct(x._1 as memid, x._2 as role, x._3 as mtype))").as("members"))
    val wg = Seq((101L, Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))))
      .toDF("id", "p")
      .select(col("id"), expr("transform(p, q -> struct(q._1 as lon, q._2 as lat))").as("pts"))
    val cyc = Assembly.polygonsFromRelations(selfRel, wg).collect()
    assert(cyc.length === 1)
    assert(cyc.head.getSeq[Any](cyc.head.fieldIndex("rings")).size === 1)
  }

  private def mkPoints(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val (lon, lat) = Images.position(i.toLong, world.clusterCenters)
      (i.toLong, lon, lat)
    }.toDF("pt_id", "lon", "lat")
  }

  private def bruteForcePip(points: Seq[(Long, Double, Double)]): Set[(Long, String, Long)] = {
    points.flatMap { case (id, lon, lat) =>
      expectedPolys.collect { case ((src, pid), rings) if GeomEval.pip(lon, lat, rings) =>
        (id, src, pid)
      }
    }.toSet
  }

  test("J3 PIP join: all three modes equal brute force") {
    import spark.implicits._
    val pts = mkPoints(400).cache()
    val ptsLocal = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val expected = bruteForcePip(ptsLocal)
    for (mode <- Seq("broadcast", "shuffle", "salted", "auto")) {
      val got = SpatialJoin.pipJoin(pts, polys, res = 12, mode = mode)
        .select("pt_id", "src", "poly_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected, s"mode=$mode got=${got.size} exp=${expected.size}")
    }
    // hot-cell-targeted salting: every threshold regime — 0 (legacy: every
    // cell replicated), 1 (every occupied cell hot), 3 (mixed: the 80%-in-
    // 4-clusters fixture has both hot and cold cells), huge (no cell hot,
    // pure cold path) — must produce identical rows
    for (threshold <- Seq(0L, 1L, 3L, Long.MaxValue)) {
      val got = SpatialJoin.pipJoin(pts, polys, res = 12, mode = "salted",
        hotCellThreshold = threshold)
        .select("pt_id", "src", "poly_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected, s"salted threshold=$threshold got=${got.size} exp=${expected.size}")
    }
    assert(expected.nonEmpty, "fixture must produce at least one PIP hit")
  }

  test("J3 auto mode picks broadcast for a tiny polygon side") {
    // fixture polys are a few KB — Catalyst's size estimate must sit far
    // below the 10MB default threshold and resolve auto → broadcast
    val plan = SpatialJoin.pipJoin(mkPoints(50), polys, res = 10, mode = "auto")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("J3 broadcast path actually broadcasts") {
    val plan = SpatialJoin.pipJoin(mkPoints(50), polys, res = 10, mode = "broadcast")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("J4 kNN join equals brute force") {
    import spark.implicits._
    val pts = mkPoints(120)
    val pois = nodes.where(map_contains_key(col("tags"), "amenity"))
      .select(col("id").as("poi_id"), col("lon"), col("lat")).cache()
    val k = 3
    val got = SpatialJoin.knnJoin(pts, pois, k = k, res = 8, maxRadius = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val poiLocal = pois.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = pts.collect().flatMap { r =>
      val (id, lon, lat) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      poiLocal.map { case (pid, plon, plat) =>
        (pid, graft.spatial.cell.CellMath.haversineMeters(lon, lat, plon, plat))
      }.sortBy(t => (t._2, t._1)).take(k).zipWithIndex
        .map { case ((pid, _), i) => (id, pid, i + 1) }
    }.toSet
    assert(got === expected)
  }

  test("J4 kNN straggler fallback is measured (observe + accessor), result still exact") {
    import spark.implicits._
    val pts = mkPoints(80)
    val pois = nodes.where(map_contains_key(col("tags"), "amenity"))
      .select(col("id").as("poi_id"), col("lon"), col("lat")).cache()
    val k = 3
    // maxRadius=1 starves the ring expansion: most points cannot prove the
    // k-th distance safe after one ring and take the exact fallback — the
    // "bounded straggler" claim must be measured, not assumed
    val got = SpatialJoin.knnJoin(pts, pois, k = k, res = 8, maxRadius = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val n = SpatialJoin.lastKnnStragglerCount
    assert(n > 0 && n <= 80, s"expected a positive straggler count <= 80, got $n")
    // fallback rows are exact: same brute-force truth as the main path
    val poiLocal = pois.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = pts.collect().flatMap { r =>
      val (id, lon, lat) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      poiLocal.map { case (pid, plon, plat) =>
        (pid, graft.spatial.cell.CellMath.haversineMeters(lon, lat, plon, plat))
      }.sortBy(t => (t._2, t._1)).take(k).zipWithIndex
        .map { case ((pid, _), i) => (id, pid, i + 1) }
    }.toSet
    assert(got === expected)
    // the accessor reflects the most recent call (10 points can at most
    // leave 10 stragglers), not the 80-point run's stale fallback
    SpatialJoin.knnJoin(pts.limit(10), pois, k = 1, res = 8, maxRadius = 16).count()
    val n2 = SpatialJoin.lastKnnStragglerCount
    assert(n2 >= 0 && n2 <= 10, s"accessor not refreshed by latest call: $n2")
  }

  test("J4 kNN frees its per-round checkpoint blocks (only the result stays persisted)") {
    import spark.implicits._
    val pts = mkPoints(60)
    val pois = nodes.where(map_contains_key(col("tags"), "amenity"))
      .select(col("id").as("poi_id"), col("lon"), col("lat"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SpatialJoin.knnJoin(pts, pois, k = 2, res = 8, maxRadius = 16)
    out.count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // exactly one new persistent RDD: the returned result's localCheckpoint
    assert(leaked.size <= 1, s"leaked checkpoint RDDs: $leaked")
  }

  test("consumer load balance: 16 Z-order shards within ±50% of mean (reference SLA)") {
    // reference end_to_end_integration.rs:174-187: 16 bbox-sharded consumers,
    // per-consumer element count within 50% of the mean. Our sharding is
    // Z-order RANGE partitioning, which balances by count even though the
    // fixture points are cluster-skewed (80% in 4 hot clusters).
    import graft.spatial.cell.{functions => F}
    val pts = mkPoints(4000).withColumn("cell", F.cell_of(col("lon"), col("lat"), 12))
    val sharded = SpatialJoin.repartitionByCellPrefix(pts, "cell", 16)
    val sizes = sharded.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 16)
    val mean = sizes.sum.toDouble / sizes.length
    sizes.foreach { s =>
      assert(math.abs(s - mean) <= 0.5 * mean, s"shard size $s vs mean $mean: ${sizes.toSeq}")
    }
  }

  test("bucketed cell join is exchange-free and matches the shuffle join") {
    import graft.spatial.cell.{functions => F}
    val res = 12
    val pts = mkPoints(300).withColumn("cell", F.cell_of(col("lon"), col("lat"), res))
    val pcs = SpatialJoin.polygonCells(
      polys.withColumnRenamed("id", "poly_id").withColumnRenamed("tags", "poly_tags"), res)
      .drop("bbox")
    SpatialJoin.writeBucketedByCell(pts, "bspec_points", buckets = 8)
    SpatialJoin.writeBucketedByCell(pcs, "bspec_polycells", buckets = 8)
    // tiny fixture tables would be auto-broadcast (that plan is also
    // exchange-free only on one side); force the large-table shape the
    // bucketing claim is about — SMJ over co-bucketed scans, zero shuffles
    val thresholdWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = SpatialJoin.bucketedCellJoin(spark, "bspec_points", "bspec_polycells")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      val got = joined.select("pt_id", "src", "poly_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val expected = SpatialJoin.pipJoin(mkPoints(300), polys, res = res, mode = "shuffle")
        .select("pt_id", "src", "poly_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdWas)
      spark.sql("DROP TABLE IF EXISTS bspec_points")
      spark.sql("DROP TABLE IF EXISTS bspec_polycells")
    }
  }

  test("tile assignment: every PIP hit shares a tile between point and polygon") {
    val z = 10
    val pts = mkPoints(300)
    val assigned = Tiles.assignPoints(pts, z)
    val polyTiles = Tiles.assignPolygons(polys.where(col("src") === "relation"), z)
    // for every point inside a relation polygon, the point's tile must be
    // among the polygon's assigned tiles (tile-center OR vertex OR interior)
    val hits = SpatialJoin.pipJoin(assigned, polys.where(col("src") === "relation"), res = 12)
      .select("pt_id", "poly_id", "tile")
    val joined = hits.join(polyTiles.withColumnRenamed("id", "poly_id"),
      Seq("poly_id", "tile"), "left_semi")
    assert(joined.count() === hits.count())
  }

  test("per-tile aggregation (A7) counts match total") {
    val z = 8
    val assigned = Tiles.assignPoints(mkPoints(500), z)
    val stats = Tiles.tileStats(assigned)
    assert(stats.agg(sum("n")).collect().head.getLong(0) === 500L)
    assert(stats.select("tile").distinct().count() === stats.count())
  }

  test("repartitionByCellPrefix yields requested partitioning") {
    val df = Tiles.assignPoints(mkPoints(1000), 10)
    val parted = SpatialJoin.repartitionByCellPrefix(df, "tile", 8)
    assert(parted.rdd.getNumPartitions === 8)
    assert(parted.count() === 1000)
  }
}
