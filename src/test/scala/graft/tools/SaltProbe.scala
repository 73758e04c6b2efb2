package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measures the shuffle-write saving of hot-cell-targeted salting
  * (round-5 pipJoin change): runs the p5-shaped graft join at a given sf
  * in salted mode under three hotCellThreshold regimes and reports total
  * shuffle bytes written + wall per run.
  *
  *   sbt -batch "Test/runMain graft.tools.SaltProbe /root/testdata/sf0.1"
  *
  * Expected shape: thr=0 (legacy, every polygon-cell row replicated x8)
  * writes ~salt x the polygon-side bytes of thr=huge (nothing hot, no
  * replication); the default threshold sits at legacy-level safety for
  * genuinely hot cells only. Row counts must be identical across regimes.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]").appName("salt-probe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      // the fixture polygon side is tiny and would auto-broadcast, hiding
      // the build-side shuffle the salting claim is about — force the
      // at-scale shuffle-join shape (same trick as the bucketed-join spec)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val images = graft.EntryFixtures.images(spark, sfDir)
      .select("image_id", "lon", "lat").cache()
    val polys = graft.EntryFixtures.polygons(spark, sfDir).cache()
    images.count(); polys.count()

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    def measure(label: String, thr: Long): Long = {
      bytes.set(0L)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = graft.pipeline.GraftJob.joinRows(images, polys, z = 10, res = 12,
        mode = "salted", salt = 8, hotCellThreshold = thr).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"[salt] $label%-28s rows=$n%8d shuffleWriteMB=${bytes.get / 1e6}%9.1f wall=$wall%6.2fs")
      n
    }
    // warm both shapes once so JIT/scan caching doesn't skew the comparison
    measure("warmup (thr=0)", 0L)
    measure("warmup (thr=max)", Long.MaxValue)
    val a = measure("legacy full-salt (thr=0)", 0L)
    val b = measure("hot-only (thr=1000)", 1000L)
    val c = measure("no-hot (thr=max)", Long.MaxValue)
    require(a == b && b == c, s"row counts diverged across regimes: $a $b $c")

    // The fixture's polygon side is small, so shuffle BYTES barely move —
    // report the replicated build-side ROW counts, the quantity that
    // scales with polygon-table size (the at-100-TB saving is 8x on the
    // ~10^7-polygon cell cover).
    import org.apache.spark.sql.functions._
    val pc = graft.spatial.join.SpatialJoin.polygonCells(
      polys.withColumnRenamed("id", "poly_id").withColumnRenamed("tags", "poly_tags"), 12)
      .drop("bbox")
    val p = pc.count()
    val pts = graft.tiles.Tiles.assignPoints(images, 10)
      .withColumn("cell", graft.spatial.cell.functions.cell_of(col("lon"), col("lat"), 12))
    for (thr <- Seq(100L, 300L, 1000L)) {
      val hot = pts.groupBy("cell").agg(count(lit(1)).as("n")).where(col("n") >= thr)
      val hotCells = hot.count()
      val hotPolyRows = pc.join(hot.select("cell"), "cell").count()
      val legacy = 8 * p
      val targeted = p + 7 * hotPolyRows
      println(f"[salt] thr=$thr%-7d polyCellRows=$p hotCells=$hotCells " +
        f"buildRows legacy(x8)=$legacy hot-only=$targeted " +
        f"(${100.0 * (legacy - targeted) / legacy}%.1f%% fewer)")
    }
    spark.stop()
  }
}
