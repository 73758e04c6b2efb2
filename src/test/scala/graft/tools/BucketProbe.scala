package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the wall-clock effect of CheckpointedRunner's bounded bucket
  * concurrency at bench scale (round-4 verdict item 8):
  *
  *   sbt -batch "Test/runMain graft.tools.BucketProbe /root/testdata/sf0.1"
  *
  * Same staged input, parallelism 1 vs 4, fresh outDir per run (no marker
  * skipping). Small buckets serialize driver-side job submission at
  * parallelism 1; the pool overlaps them.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]").appName("bucket-probe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tiled = graft.tiles.Tiles.assignPoints(
      graft.EntryFixtures.images(spark, sfDir).select("image_id", "lon", "lat"), 10)
      .cache()
    tiled.count()
    val work = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("tile").agg(count(lit(1)).as("n"))
    val base = java.nio.file.Files.createTempDirectory("bucket-probe").toString
    def timed(par: Int, tag: String): Double = {
      val t0 = System.nanoTime()
      graft.pipeline.CheckpointedRunner.run(spark, tiled, s"$base/$tag", work,
        bucketRes = 2, lineage = "bp", parallelism = par)
      (System.nanoTime() - t0) / 1e9
    }
    timed(1, "warm")
    for (i <- 1 to 2) {
      val seq = timed(1, s"seq$i")
      val conc = timed(4, s"conc$i")
      println(f"[bucket] attempt $i: parallelism=1 $seq%.2fs  parallelism=4 $conc%.2fs  speedup=${seq / conc}%.2fx")
    }
    spark.stop()
  }
}
