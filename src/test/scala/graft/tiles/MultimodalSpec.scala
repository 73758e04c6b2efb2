package graft.tiles

import graft.SparkTestBase
import graft.fixtures.OsmWorld

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val centers = OsmWorld.generate(seed = 42, nClusters = 2, nodesPerCluster = 10).clusterCenters
  private lazy val images = Images.synthesize(spark, 60, centers, 3).cache()

  test("imageFeatures decodes every image, dims validated") {
    val f = Multimodal.imageFeatures(images).cache()
    assert(f.count() === 60)
    assert(f.where(!col("dims_ok")).count() === 0)
    assert(f.where(col("mean_luma") <= 0 || col("mean_luma") >= 255).count() === 0)
    // deterministic pixels → deterministic features
    val f2 = Multimodal.imageFeatures(images)
    assert(f.orderBy("image_id").collect().toSeq === f2.orderBy("image_id").collect().toSeq)
  }

  test("resize produces decodable images at target dims") {
    val r = Multimodal.resize(images, 8, 8)
    val decoded = r.select("bytes").collect().map(row => Images.decode(row.getAs[Array[Byte]](0)))
    assert(decoded.forall(img => img.w == 8 && img.h == 8))
  }

  test("audio features (stub decode): fixed shape, deterministic") {
    val media = images.select(col("image_id").as("media_id"), col("bytes"))
    val a = Multimodal.audioFeatures(media, windows = 8).cache()
    assert(a.count() === 60)
    assert(a.select(size(col("rms_windows"))).distinct().collect().map(_.getInt(0)).toSeq === Seq(8))
    val a2 = Multimodal.audioFeatures(media, windows = 8)
    assert(a.orderBy("media_id").collect().toSeq === a2.orderBy("media_id").collect().toSeq)
  }

  test("video frame sampling (stub decode): every k-th frame, hashes stable") {
    val media = images.select(col("image_id").as("media_id"), col("bytes"))
    val v = Multimodal.videoFrameSample(media, everyK = 10, frames = 50)
    val row = v.orderBy("media_id").collect().head
    assert(row.getSeq[Int](1) === Seq(0, 10, 20, 30, 40))
    assert(row.getSeq[Long](2).distinct.size === 5)
  }

  test("video stub tolerates empty payloads (no div-by-zero)") {
    import spark.implicits._
    val media = Seq(("empty", Array.empty[Byte])).toDF("media_id", "bytes")
    val out = Multimodal.videoFrameSample(media, everyK = 10, frames = 30).collect()
    assert(out.length === 1 && !out.head.getAs[Boolean]("real_decode"))
  }
}
