package graft.osmpbf.source

import graft.osmpbf.codec.FrameScanner
import graft.osmpbf.model._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed facade over the `osmpbf` DataSourceV2 — the Spark analog of the
  * reference's high-level Reader API (`nodes()`/`ways()` reader.rs:366-396,
  * `count_elements` reader.rs:345-362). Filters pushed through these
  * Datasets reach the source's blob pruning + decode-kind pushdown.
  */
object OsmPbf {

  def raw(spark: SparkSession, path: String, kind: String = "all"): DataFrame =
    spark.read.format("osmpbf").option("kind", kind).load(path)

  def nodes(spark: SparkSession, path: String): Dataset[OsmNode] = {
    import spark.implicits._
    raw(spark, path, "nodes")
      .where(col("kind") === "node")
      .select("id", "lat_nd", "lon_nd", "lat", "lon", "tags", "info", "blob_offset")
      .as[OsmNode]
  }

  def ways(spark: SparkSession, path: String): Dataset[OsmWay] = {
    import spark.implicits._
    raw(spark, path, "ways")
      .where(col("kind") === "way")
      .select("id", "refs", "tags", "info", "blob_offset")
      .as[OsmWay]
  }

  def relations(spark: SparkSession, path: String): Dataset[OsmRelation] = {
    import spark.implicits._
    raw(spark, path, "relations")
      .where(col("kind") === "relation")
      .select("id", "members", "tags", "info", "blob_offset")
      .as[OsmRelation]
  }

  /** 4-way typed count in one scan (reference `count_elements`,
    * reader.rs:345-362): partial aggregation happens map-side, so this
    * shuffles only one row per partition per kind. */
  def countElements(spark: SparkSession, path: String): DataFrame =
    raw(spark, path).groupBy("kind").count()

  /** Header metadata (reference `header_blob`/HeaderBlock accessors,
    * indexed_reader.rs:203-205, header_block.rs:7-31). Driver-side read of
    * the first OSMHeader blob only.
    *
    * Prefer the SparkSession overload on a cluster: a bare
    * `new Configuration()` carries none of the session's S3/HDFS
    * credentials or endpoint settings (the exact trap OsmPbfScan documents
    * for its own conf), so the conf-less form only works where the default
    * Hadoop config can already reach the path. */
  def header(path: String, conf: Configuration = new Configuration()): Option[HeaderMeta] =
    FrameScanner.scan(path, conf).header

  /** Header metadata through the session's Hadoop conf — the cluster-safe
    * form (credentials/endpoints preserved). */
  def header(spark: SparkSession, path: String): Option[HeaderMeta] =
    header(path, spark.sessionState.newHadoopConf())
}
