package graft.tiles

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Snapshot-versioned Parquet layout with Iceberg-style metadata JSON —
  * the offline stand-in for an Iceberg catalog (SURVEY.md §7.0: no Iceberg
  * jar ships in /opt/spark/jars, so the engine reads through this one seam
  * and a real catalog can be slotted in where the jar exists).
  *
  * Layout:
  *   <root>/data/snap=<id>/part-*.parquet   (immutable per snapshot)
  *   <root>/metadata/v<id>.metadata.json     (snapshot id, schema, manifest)
  *   <root>/metadata/current                 (text: latest snapshot id)
  */
object ImageTable {

  def write(df: DataFrame, root: String, snapshotId: Long = 1L): Unit = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val dataDir = s"$root/data/snap=$snapshotId"
    df.write.mode("overwrite").parquet(dataDir)
    // manifest from the Hadoop FS (works on HDFS/S3, not just local disk)
    val fs = graft.util.HadoopIO.fileSystem(dataDir, conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(s => s"""{"path":"${s.getPath.toString}","size":${s.getLen}}""")
    val schemaJson = df.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val meta =
      s"""{"format-version":2,"snapshot-id":$snapshotId,
         |"schema":"$schemaJson",
         |"manifest":[${files.mkString(",")}],
         |"written-at":"deterministic"}""".stripMargin
    graft.util.HadoopIO.writeString(s"$root/metadata/v$snapshotId.metadata.json", meta, conf)
    graft.util.HadoopIO.writeString(s"$root/metadata/current", snapshotId.toString, conf)
  }

  def currentSnapshot(spark: SparkSession, root: String): Long =
    graft.util.HadoopIO.readString(s"$root/metadata/current",
      spark.sessionState.newHadoopConf()).trim.toLong

  def load(spark: SparkSession, root: String): DataFrame =
    loadSnapshot(spark, root, currentSnapshot(spark, root))

  def loadSnapshot(spark: SparkSession, root: String, snapshotId: Long): DataFrame =
    spark.read.parquet(s"$root/data/snap=$snapshotId")

  /** Per-row image parity check vs the deterministic generator
    * (input_hint: "decoded-pixel allclose (PSNR≥40dB for lossy) + caption
    * equality"). Distributed: decodes on executors, returns per-row
    * verdicts; callers assert `min(psnr_db) ≥ 40 && all captions equal`.
    * PSNR=∞ (lossless exact match) is reported as 1e9 dB. */
  def parity(df: DataFrame, centers: Seq[(Double, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val centersB = spark.sparkContext.broadcast(centers)
    df.select("image_id", "bytes", "w", "h", "caption", "phash").map { r =>
      val imageId = r.getString(0)
      val idx = imageId.stripPrefix("img_").toLong
      // single fused pass over a per-thread reused decode buffer: PSNR vs
      // the generator formula + average-hash, with no Img / raster / native
      // Inflater allocated per row (GC was the serial term capping scaling)
      val st = Images.parityStats(r.getAs[Array[Byte]](1), idx)
      val p = if (st.w == r.getInt(2) && st.h == r.getInt(3)) st.psnrDb else 0.0
      val (lon, lat) = Images.position(idx, centersB.value)
      val expectedCaption = Images.captionFor(idx, lon, lat)
      (imageId,
        if (p.isInfinity) 1e9 else p,
        r.getString(4) == expectedCaption,
        r.getLong(5) == st.ahash)
    }.toDF("image_id", "psnr_db", "caption_ok", "phash_ok")
  }
}
