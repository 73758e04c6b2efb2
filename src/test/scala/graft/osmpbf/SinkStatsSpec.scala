package graft.osmpbf

import graft.SparkTestBase
import graft.fixtures.OsmWorld
import graft.osmpbf.source.{OsmAggregators, OsmPbf, OsmPbfSink, OsmStats}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkStatsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val (pbfPath, world) = OsmWorld.cachedPbf(tmpDir, seed = 42, nClusters = 3, nodesPerCluster = 80)

  test("S8 sink: write partitioned pbf dir, read back identical elements") {
    val outDir = s"$tmpDir/sinkout"
    val nodes = OsmPbf.nodes(spark, pbfPath).repartition(3)
    val ways = OsmPbf.ways(spark, pbfPath).repartition(2)
    val rels = OsmPbf.relations(spark, pbfPath)
    OsmPbfSink.write(nodes, ways, rels, outDir)
    val files = new java.io.File(outDir).listFiles().filter(_.getName.endsWith(".pbf"))
    assert(files.length >= 3)
    val back = OsmPbf.raw(spark, outDir)
    val counts = back.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("node") === world.nodes.size)
    assert(counts("way") === world.ways.size)
    assert(counts("relation") === world.relations.size)
    // tags + coords survive the round trip
    val got = OsmPbf.nodes(spark, outDir).collect().map(n => n.id -> ((n.lat_nd, n.tags))).toMap
    world.nodes.take(40).foreach { n =>
      assert(got(n.id) === ((n.lat_nd, n.tags)), s"node ${n.id}")
    }
  }

  test("A3 blob statistics histogram") {
    val stats = OsmStats.blobStats(spark, pbfPath)
    val byType = stats.groupBy("blob_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("OSMHeader") === 1)
    assert(byType("OSMData") >= 1)
    val sums = stats.agg(sum("node_count"), sum("way_count"), sum("relation_count"))
      .collect().head
    assert(sums.getLong(0) === world.nodes.size)
    assert(sums.getLong(1) === world.ways.size)
  }

  test("A1 processing stats in one scan") {
    val r = OsmStats.processingStats(spark, pbfPath).collect().head
    assert(r.getAs[Long]("elements_processed") ===
      world.nodes.size + world.ways.size + world.relations.size)
    assert(r.getAs[Long]("nodes") === world.nodes.size)
  }

  test("F7 dependency resolution: exactly the way-referenced nodes") {
    val got = OsmStats.nodesReferencedByWays(spark, pbfPath)
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = world.ways.flatMap(_.refs).toSet
    assert(got === expected)
  }

  test("A4 par_map_reduce analog: bbox Aggregator partial/final == sequential fold") {
    import spark.implicits._
    val pts = OsmPbf.nodes(spark, pbfPath).map(n => (n.lon, n.lat)).repartition(7)
    val agg = pts.select(OsmAggregators.bboxAgg.toColumn).collect().head
    // sequential ground truth
    val seq = world.nodes.foldLeft(OsmAggregators.BBoxAcc(180, 90, -180, -90, 0)) { (b, n) =>
      OsmAggregators.BBoxAcc(math.min(b.minLon, n.lon), math.min(b.minLat, n.lat),
        math.max(b.maxLon, n.lon), math.max(b.maxLat, n.lat), b.n + 1)
    }
    assert(agg === seq) // parallel ≡ sequential (reader_integration.rs:157 analog)
  }

  test("bbox Aggregator over an EMPTY input reports NaN bounds, not the inverted sentinel") {
    import spark.implicits._
    val none = spark.emptyDataset[(Double, Double)]
    val agg = none.select(OsmAggregators.bboxAgg.toColumn).collect().head
    assert(agg.n === 0L)
    // the fold sentinel (minLon=180 > maxLon=-180) would read as a real box
    assert(agg.minLon.isNaN && agg.minLat.isNaN && agg.maxLon.isNaN && agg.maxLat.isNaN,
      s"empty bbox leaked the fold sentinel: $agg")
  }

  test("sink refuses a target holding part files unless overwrite=true (no stale mixing)") {
    import spark.implicits._
    val outDir = s"$tmpDir/sink-overwrite"
    val nodes = OsmPbf.nodes(spark, pbfPath)
    val ways = OsmPbf.ways(spark, pbfPath)
    val rels = OsmPbf.relations(spark, pbfPath)
    // first write with MORE partitions than the second
    OsmPbfSink.write(nodes.repartition(5), ways.repartition(1), rels.repartition(1), outDir)
    val firstCount = spark.read.format("osmpbf").load(outDir).count()
    intercept[java.io.IOException] {
      OsmPbfSink.write(nodes.repartition(2), ways.repartition(1), rels.repartition(1), outDir)
    }
    // plant a stats sidecar next to a part file the overwrite will replace:
    // it must not survive to describe the NEW file's blobs
    val fsDir = new java.io.File(outDir)
    val firstPart = fsDir.listFiles().map(_.getName).filter(_.startsWith("part-n-")).min
    val sidecar = new java.io.File(fsDir, firstPart + ".graft-stats.json")
    java.nio.file.Files.writeString(sidecar.toPath, "{\"stale\":true}")
    OsmPbfSink.write(nodes.repartition(2), ways.repartition(1), rels.repartition(1), outDir,
      overwrite = true)
    assert(!sidecar.exists(), "stale stats sidecar survived overwrite")
    // the 5-partition run's extra part files must be gone: same row count,
    // not first ∪ second
    assert(spark.read.format("osmpbf").load(outDir).count() === firstCount)
    val names = graft.util.HadoopIO.fileSystem(outDir, spark.sessionState.newHadoopConf())
      .listStatus(new org.apache.hadoop.fs.Path(outDir))
      .map(_.getPath.getName).filter(n => n.startsWith("part-n-")).sorted
    assert(names.length === 2, s"stale node part files survived: ${names.toSeq}")
  }

  test("part-file commit deletes an orphan same-named sidecar (no overwrite branch)") {
    import spark.implicits._
    // the overwrite branch never runs here: the target holds NO part files,
    // only a leftover sidecar whose part file is already gone (crash between
    // part-file and sidecar delete, or external cleanup). The new write's
    // task-level commit must drop it — otherwise the OLD run's counts/zone
    // maps describe the NEW bytes whenever the sizes happen to collide.
    val outDir = s"$tmpDir/sink-orphan-sidecar"
    new java.io.File(outDir).mkdirs()
    val orphan = new java.io.File(outDir, "part-n-00000.osm.pbf.graft-stats.json")
    java.nio.file.Files.writeString(orphan.toPath, "{\"stale\":true}")
    val nodes = OsmPbf.nodes(spark, pbfPath)
    OsmPbfSink.write(nodes.repartition(1),
      spark.emptyDataset[graft.osmpbf.model.OsmWay],
      spark.emptyDataset[graft.osmpbf.model.OsmRelation], outDir)
    assert(!orphan.exists(), "orphan sidecar survived a same-named part-file commit")
    assert(new java.io.File(outDir, "part-n-00000.osm.pbf").exists())
  }

  test("sink round-trips rows whose info.ts is NULL (timestamp-less source files)") {
    import spark.implicits._
    import graft.osmpbf.model.{OsmInfo, OsmNode, OsmRelation, OsmWay}
    // exactly what reading a spec-legal timestamp-less PBF now produces:
    // info present, ts NULL — writing it back must omit the field, not NPE
    val nodes = spark.createDataset(Seq(
      OsmNode(1L, 1000L, 2000L, 1e-6, 2e-6, Map.empty[String, String],
        Some(OsmInfo(2, null, 5L, 7, "u", true)), 0L),
      OsmNode(2L, 3000L, 4000L, 3e-6, 4e-6, Map.empty[String, String],
        Some(OsmInfo(1, new java.sql.Timestamp(1700000000000L), 6L, 8, "v", true)), 0L)))
    val outDir = s"$tmpDir/sink-null-ts"
    OsmPbfSink.write(nodes, spark.emptyDataset[OsmWay],
      spark.emptyDataset[OsmRelation], outDir)
    val back = spark.read.format("osmpbf").load(outDir)
      .select("id", "info.ts").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(back(1L) === null, "NULL ts must survive the sink round trip")
    assert(back(2L) !== null)
  }

  test("checksum Aggregator is partition-count invariant") {
    import spark.implicits._
    val data = (1 to 500).map(i => Array.tabulate[Byte](64)(j => ((i * 17 + j * 42) % 256).toByte))
    val a = spark.createDataset(data).repartition(1).select(OsmAggregators.checksumAgg.toColumn).collect().head
    val b = spark.createDataset(data).repartition(13).select(OsmAggregators.checksumAgg.toColumn).collect().head
    assert(a === b)
    assert(a !== 0L)
  }
}
