package graft.osmpbf.source

import graft.osmpbf.codec.FrameScanner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader statistics + dependency resolution (reference A1/A3/F7).
  */
object OsmStats {

  /** Per-blob index statistics as a DataFrame — the analog of the
    * reference's `IndexedReader::statistics()` blob-type histogram +
    * per-blob counts (indexed_reader.rs:261-279). Frame scans read only
    * frame lengths (no payload), and run ON EXECUTORS (one task per file) —
    * a driver-side loop over a 100-TB directory would serialize hours of
    * seeks before the first real task. */
  def blobStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val confS = new graft.util.SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val paths = OsmPbfSource.resolvePaths(path, confS.value)
    val blobs = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 2048)))
      .flatMap(p => FrameScanner.scan(p, confS.value).blobs)
      .map(b => (b.path, b.blobType, b.headerOffset, b.dataSize.toLong,
        b.nodeCount, b.wayCount, b.relationCount, b.minId, b.maxId))
    blobs
      .toDF("path", "blob_type", "offset", "data_size",
        "node_count", "way_count", "relation_count", "min_id", "max_id")
      // unknown stats (foreign files / header blobs) surface as NULL, not -1
      .withColumn("node_count", when(col("node_count") >= 0, col("node_count")))
      .withColumn("way_count", when(col("way_count") >= 0, col("way_count")))
      .withColumn("relation_count", when(col("relation_count") >= 0, col("relation_count")))
      .withColumn("min_id", when(col("min_id") =!= Long.MinValue, col("min_id")))
      .withColumn("max_id", when(col("max_id") =!= Long.MaxValue, col("max_id")))
  }

  /** ProcessingStats analog (reader.rs:44-52) in one scan. */
  def processingStats(spark: SparkSession, path: String): DataFrame =
    OsmPbf.raw(spark, path)
      .agg(count(lit(1)).as("elements_processed"),
        sum(when(col("kind") === "node", 1L).otherwise(0L)).as("nodes"),
        sum(when(col("kind") === "way", 1L).otherwise(0L)).as("ways"),
        sum(when(col("kind") === "relation", 1L).otherwise(0L)).as("relations"),
        sum(when(col("kind") === "changeset", 1L).otherwise(0L)).as("changesets"))

  /** Dependency resolution (F7 — `ways_only(resolve_deps = true)`,
    * indexed_reader.rs:81-90): the nodes referenced by any way, as a
    * distributed semi-join (never a driver-side set). */
  def nodesReferencedByWays(spark: SparkSession, path: String): DataFrame = {
    val nodes = OsmPbf.nodes(spark, path).toDF()
    val refs = OsmPbf.ways(spark, path).toDF()
      .select(explode(col("refs")).as("id"))
    nodes.join(refs, Seq("id"), "left_semi")
  }
}
