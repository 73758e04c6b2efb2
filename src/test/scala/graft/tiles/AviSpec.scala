package graft.tiles

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AviSpec extends AnyFunSuite with SparkTestBase {

  test("AVI round trip: frame pointers count and per-frame decode match the source frames") {
    val frames = (0 until 12).map(f => Images.synthPixels(16, 8, 500L + f))
    val avi = Avi.encode(frames.map(Png.encode), 16, 8)
    assert(Avi.isAvi(avi))
    val ptrs = Avi.framePointers(avi)
    assert(ptrs.size === 12)
    frames.zipWithIndex.foreach { case (img, i) =>
      val dec = Avi.decodeFrame(avi, ptrs(i))
      assert(dec.px.toSeq === img.px.toSeq, s"frame $i")
    }
  }

  test("odd-length PNG frames stay aligned (RIFF word padding)") {
    // force odd payload sizes by varying frame content until one is odd
    val frames = (0 until 8).map(f => Png.encode(Images.synthPixels(5, 3, 77L + f)))
    val avi = Avi.encode(frames, 5, 3)
    val ptrs = Avi.framePointers(avi)
    assert(ptrs.size === 8)
    ptrs.zipWithIndex.foreach { case (p, i) =>
      assert(Avi.decodeFrame(avi, p).w === 5, s"frame $i")
    }
  }

  test("corrupt negative chunk length throws instead of spinning the walk") {
    val frames = (0 until 4).map(f => Png.encode(Images.synthPixels(8, 8, 9L + f)))
    val avi = Avi.encode(frames, 8, 8)
    val ptrs = Avi.framePointers(avi)
    // overwrite the first frame chunk's length field with -8 (little endian)
    val corrupt = avi.clone()
    val lenOff = ptrs.head._1 - 4
    java.nio.ByteBuffer.wrap(corrupt, lenOff, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-8)
    val e = intercept[IllegalArgumentException](Avi.framePointers(corrupt))
    assert(e.getMessage.contains("negative length"))
  }

  test("videoFrameSample: real decode on AVI, hashes equal the source frames' aHash") {
    import spark.implicits._
    val media = spark.range(0, 20).map(i => (f"vid_$i%06d", Avi.synth(i, nFrames = 24)))
      .toDF("media_id", "bytes")
    val out = Multimodal.videoFrameSample(media, everyK = 6, frames = 24).cache()
    assert(out.where(!col("real_decode")).count() === 0)
    val row = out.where(col("media_id") === "vid_000003").collect().head
    assert(row.getSeq[Int](row.fieldIndex("frame_idx")) === Seq(0, 6, 12, 18))
    val hashes = row.getSeq[Long](row.fieldIndex("frame_hash"))
    val expected = Seq(0, 6, 12, 18).map(f =>
      Images.aHash(Images.synthPixels(16, 16, 3L * 1000 + f)))
    assert(hashes === expected)
  }

  test("non-AVI bytes fall through to the labeled stub") {
    import spark.implicits._
    val df = Seq(("x", Array.tabulate[Byte](4096)(_.toByte))).toDF("media_id", "bytes")
    val row = Multimodal.videoFrameSample(df, everyK = 10, frames = 50).collect().head
    assert(!row.getAs[Boolean]("real_decode"))
    assert(row.getSeq[Int](row.fieldIndex("frame_idx")).size === 5)
  }
}
