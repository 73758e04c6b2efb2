package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end probe harness (Test/runMain graft.tools.ProbeMain):
  * drives the osmpbf source/sink surfaces the way a user would — including
  * the deliberately-wrong inputs (bogus kind predicate, corrupt file,
  * unsupported codec) — and prints observations for eyeball verification.
  * Not a ScalaTest suite: this is runtime observation tooling, kept in test
  * scope so it never ships in the library jar. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", 4).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val (pbfPath, _) = graft.fixtures.OsmWorld.cachedPbf("/tmp/probe-fx", 42L, 4, 100)
    val df = spark.read.format("osmpbf").load(pbfPath)
    println("PROBE1 total=" + df.count())
    println("PROBE1 bogus-kind=" + df.where($"kind" === "bogus").count())

    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pbfPath))
    val mid = bytes.length / 2
    for (i <- mid until math.min(mid + 64, bytes.length)) bytes(i) = (bytes(i) ^ 0xff).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/probe-fx/corrupt.osm.pbf"), bytes)
    val bad = spark.read.format("osmpbf").load("/tmp/probe-fx/corrupt.osm.pbf")
    val strict = try { bad.count(); "NO-ERROR (bad!)" }
      catch { case e: Exception =>
        "FAILED-AS-EXPECTED: " + Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage).take(200) }
    println("PROBE2 strict=" + strict)
    val perm = spark.read.format("osmpbf").option("permissive", "true").load("/tmp/probe-fx/corrupt.osm.pbf")
    println("PROBE2 permissive rows=" + perm.count() + " (orig " + df.count() + ")")

    locally {
      val w = new graft.osmpbf.codec.ProtoWriter
      w.varint(2, 10L)
      w.bytes(4, Array[Byte](1, 2, 3))
      val msg = try { graft.osmpbf.codec.PbfCodec.decodeBlobPayload(w.toBytes, 0, w.toBytes.length); "NO-ERROR" }
        catch { case e: Exception => e.getMessage }
      println("PROBE3 lzma-error=" + msg)
    }

    val nodes = graft.osmpbf.source.OsmPbf.nodes(spark, pbfPath)
    val ways = graft.osmpbf.source.OsmPbf.ways(spark, pbfPath)
    val rels = graft.osmpbf.source.OsmPbf.relations(spark, pbfPath)
    graft.util.HadoopIO.delete("/tmp/probe-sink", spark.sessionState.newHadoopConf())
    graft.osmpbf.source.OsmPbfSink.write(nodes.repartition(3), ways.repartition(2), rels.repartition(2), "/tmp/probe-sink", overwrite = true)
    val back = spark.read.format("osmpbf").load("/tmp/probe-sink")
    println("PROBE4 sink round trip: orig=" + df.count() + " back=" + back.count())
    val names = new java.io.File("/tmp/probe-sink").listFiles().map(_.getName).sorted
    println("PROBE4 leftover-temps=" + names.count(_.contains("_temporary")) + " files=" + names.mkString(","))

    locally {
      val p = "/tmp/probe-fx/cs.osm.pbf"
      val w2 = graft.osmpbf.codec.PbfWriter(p)
      w2.addChangeSet(graft.osmpbf.model.OsmChangeSet(77L, Map("created_by" -> "probe", "comment" -> "hi"), 0L))
      w2.close()
      val cs = spark.read.format("osmpbf").load(p).where($"kind" === "changeset")
      println("PROBE5 changeset row=" + cs.select("id", "tags").collect().mkString(";"))
    }

    locally {
      val p = "/tmp/probe-fx/hdr.osm.pbf"
      val w3 = graft.osmpbf.codec.PbfWriter(p, elementsPerBlock = 10)
      for (i <- 1 to 25) w3.addNode(graft.osmpbf.model.OsmNode(i.toLong, i * 100L, i * 100L, i.toDouble, i.toDouble, Map.empty, None, 0L))
      w3.close()
      val sc = graft.osmpbf.codec.FrameScanner.scan(p)
      println("PROBE6 frame-types=" + sc.blobs.map(_.blobType).mkString(","))
    }
    // replication: batch merge + streamed fold agree
    locally {
      val dir = "/tmp/probe-fx/repl"
      graft.util.HadoopIO.delete(dir, spark.sessionState.newHadoopConf())
      new java.io.File(dir).mkdirs()
      def writeDiff(seq: Long, tag: String, ver: Int): Unit = {
        val w = graft.osmpbf.codec.PbfWriter(f"$dir/$seq%09d.osm.pbf")
        w.addNode(graft.osmpbf.model.OsmNode(1L, 100L, 100L, 1e-4, 1e-4, Map("name" -> tag),
          Some(graft.osmpbf.model.OsmInfo(ver, new java.sql.Timestamp(0L), 1L, 1, "u", true)), 0L))
        w.close()
      }
      writeDiff(1L, "v1", 1); writeDiff(2L, "v2", 2)
      val diffs = spark.read.format("osmpbf").load(dir)
        .withColumn("seq", graft.osmpbf.source.OsmReplication.seqOfFile(col("_file"))).drop("_file")
      val merged = graft.osmpbf.source.OsmReplication.applyDiffs(
        spark.read.format("osmpbf").load(dir).where(lit(false)), diffs)
      println("PROBE7 replication latest=" +
        merged.select("tags").collect().map(_.getMap[String, String](0)("name")).mkString(","))
    }
    // real WAV + AVI decode through the library surface
    locally {
      import spark.implicits._
      val wav = Seq(("a", graft.tiles.Wav.synth(3L))).toDF("media_id", "bytes")
      val w = graft.tiles.Multimodal.audioFeatures(wav, 4).select("real_decode", "sample_rate").collect().head
      val avi = Seq(("v", graft.tiles.Avi.synth(3L, 12))).toDF("media_id", "bytes")
      val vrow = graft.tiles.Multimodal.videoFrameSample(avi, 4, 12).select("real_decode", "frame_idx").collect().head
      println("PROBE8 wav-real=" + w.getBoolean(0) + "@" + w.getInt(1) +
        " avi-real=" + vrow.getBoolean(0) + " frames=" + vrow.getSeq[Int](1).mkString("/"))
    }
    println("PROBES-DONE")
    spark.stop()
  }
}
