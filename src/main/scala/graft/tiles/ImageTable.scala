package graft.tiles

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

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
    val dataDir = s"$root/data/snap=$snapshotId"
    df.write.mode("overwrite").parquet(dataDir)
    val metaDir = Paths.get(s"$root/metadata")
    Files.createDirectories(metaDir)
    val files = new java.io.File(dataDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => s"""{"path":"${f.getAbsolutePath}","size":${f.length}}""")
    val schemaJson = df.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val meta =
      s"""{"format-version":2,"snapshot-id":$snapshotId,
         |"schema":"$schemaJson",
         |"manifest":[${files.mkString(",")}],
         |"written-at":"deterministic"}""".stripMargin
    Files.write(metaDir.resolve(s"v$snapshotId.metadata.json"),
      meta.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.write(metaDir.resolve("current"),
      snapshotId.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def currentSnapshot(root: String): Long =
    new String(Files.readAllBytes(Paths.get(s"$root/metadata/current")),
      StandardCharsets.UTF_8).trim.toLong

  def load(spark: SparkSession, root: String): DataFrame =
    loadSnapshot(spark, root, currentSnapshot(root))

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
