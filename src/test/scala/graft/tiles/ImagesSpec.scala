package graft.tiles

import graft.SparkTestBase
import graft.fixtures.OsmWorld

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImagesSpec extends AnyFunSuite with SparkTestBase {

  private lazy val centers = OsmWorld.generate(seed = 42, nClusters = 4, nodesPerCluster = 10).clusterCenters

  test("synthesis is deterministic") {
    val a = Images.synthRow(17L, centers)
    val b = Images.synthRow(17L, centers)
    assert(a.image_id === "img_000000017")
    assert(a.bytes.toSeq === b.bytes.toSeq)
    assert(a.phash === b.phash)
    assert(a.caption === b.caption)
    assert((a.lon, a.lat) === (b.lon, b.lat))
  }

  test("PNG round trip is lossless: PSNR = ∞ (≥40dB gate trivially holds)") {
    val row = Images.synthRow(3L, centers)
    val decoded = Images.decode(row.bytes)
    val regenerated = Images.synthPixels(row.w, row.h, 3L)
    assert(Images.psnr(decoded, regenerated).isPosInfinity)
  }

  test("PSNR detects corruption and measures noise level") {
    val img = Images.synthPixels(32, 32, 5L)
    val noisy = Images.synthPixels(32, 32, 5L)
    // flip one channel of one pixel by 4 → PSNR high but finite
    noisy.px(0) = noisy.px(0) ^ 0x04
    val p = Images.psnr(img, noisy)
    assert(p > 40.0 && !p.isInfinity)
    // heavy corruption → low PSNR
    val bad = Images.synthPixels(32, 32, 999L)
    assert(Images.psnr(img, bad) < 40.0)
  }

  test("distributed synthesis + ImageTable write/load + parity gate") {
    val df = Images.synthesize(spark, 200, centers, partitions = 4)
    val root = s"$tmpDir/imageTable"
    ImageTable.write(df, root, snapshotId = 7L)
    assert(ImageTable.currentSnapshot(root) === 7L)
    val loaded = ImageTable.load(spark, root)
    assert(loaded.count() === 200)
    assert(loaded.columns.toSet === Set("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"))

    val parity = ImageTable.parity(loaded, centers).cache()
    val minPsnr = parity.agg(min("psnr_db")).collect().head.getDouble(0)
    assert(minPsnr >= 40.0, s"PSNR gate: $minPsnr")
    assert(parity.where(!col("caption_ok")).count() === 0)
    assert(parity.where(!col("phash_ok")).count() === 0)
  }

  test("snapshot isolation: second snapshot does not disturb the first") {
    val root = s"$tmpDir/imageTable2"
    ImageTable.write(Images.synthesize(spark, 50, centers, 2), root, snapshotId = 1L)
    ImageTable.write(Images.synthesize(spark, 80, centers, 2), root, snapshotId = 2L)
    assert(ImageTable.loadSnapshot(spark, root, 1L).count() === 50)
    assert(ImageTable.load(spark, root).count() === 80)
    // metadata files exist per snapshot
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/metadata/v2.metadata.json")))
  }

  test("phash xor distance separates identical from different images") {
    import spark.implicits._
    val df = Images.synthesize(spark, 60, centers, 2).select("image_id", "phash")
    val joined = df.as("a").crossJoin(df.as("b"))
      .withColumn("hdist", bit_count(col("a.phash").bitwiseXOR(col("b.phash"))))
    val selfDist = joined.where(col("a.image_id") === col("b.image_id"))
      .agg(max("hdist")).collect().head.getInt(0)
    assert(selfDist === 0)
  }
}
