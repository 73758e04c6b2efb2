package graft.tools

import org.apache.spark.sql.SparkSession

/** Does a SECOND polygons() call hit the cache registered by the first?
  * (CacheManager dedupes by canonicalized plan — DSv2 relations only
  * canonicalize equal if the Table/Scan equality is stable across reads.) */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]").appName("cacheprobe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val p1 = graft.EntryFixtures.polygons(spark, sfDir)
    p1.count()
    val t1 = System.nanoTime()
    val p2 = graft.EntryFixtures.polygons(spark, sfDir) // fresh call, fresh frames
    p2.count()
    val t2 = System.nanoTime()
    val plan2 = p2.queryExecution.executedPlan.toString
    val hit = plan2.contains("InMemoryTableScan") || plan2.contains("TableCacheQueryStage")
    println(f"[cache] first=${(t1 - t0) / 1e9}%.2fs second=${(t2 - t1) / 1e9}%.2fs secondHitsCache=$hit")
    println("[cache] cached entries: " + spark.sharedState.cacheManager.toString)
    spark.stop()
  }
}
