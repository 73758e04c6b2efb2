package graft.tools
import org.apache.spark.sql.SparkSession
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("knnprobe")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val pts = graft.EntryFixtures.lineitemPoints(spark, "/root/testdata/sf0.1")
      .select("lon", "lat").distinct()
      .withColumn("pt_id", concat(round(col("lon") * 1000).cast("long"),
        lit("_"), round(col("lat") * 1000).cast("long"))).cache()
    val pois = graft.EntryFixtures.partPois(spark, "/root/testdata/sf0.1").cache()
    pts.count(); pois.count()
    // full untimed warmup at the first candidate res so JIT/codegen cost
    // doesn't land on whichever config happens to run first
    graft.spatial.join.SpatialJoin.knnJoin(pts, pois, k = 2, res = 8, maxRadius = 16).count()
    for (res <- Seq(8, 9, 10)) {
      val t0 = System.nanoTime()
      val n = graft.spatial.join.SpatialJoin.knnJoin(pts, pois, k = 2, res = res, maxRadius = 16).count()
      println(f"[knnprobe] res=$res total=${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
