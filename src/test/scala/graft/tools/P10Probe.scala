package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** p10 phase probe: separates the static-side materialization, the
  * streaming drain (per-batch work lands in foreachBatch), and the rollup
  * read, so the streaming-machinery overhead is distinguishable from the
  * per-batch graft-join cost. */
object P10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("p10probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", 16L * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val path = graft.EntryFixtures.imagesPath(spark, sfDir)
      val schema = graft.EntryFixtures.images(spark, sfDir).schema
      val out = java.nio.file.Files.createTempDirectory("graft-p10probe").toString
      val polys = graft.EntryFixtures.polygons(spark, sfDir).localCheckpoint()
      val t1 = System.nanoTime()
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(path)
      val batchWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val q = stream.writeStream
        .option("checkpointLocation", s"$out/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingGraft.writeBatchDelta(batch, polys, s"$out/delta", batchId, 10, 12)
          batchWalls += (System.nanoTime() - b0) / 1e9
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t2 = System.nanoTime()
      val n = graft.streaming.StreamingGraft.rollup(spark, s"$out/delta").count()
      val t3 = System.nanoTime()
      println(f"[p10] rep=$rep polys=${(t1 - t0) / 1e9}%.2fs stream=${(t2 - t1) / 1e9}%.2fs " +
        f"(batches=${batchWalls.map(w => f"$w%.2f").mkString(",")}) rollup=${(t3 - t2) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
