package graft.tools

import org.apache.spark.sql.SparkSession

/** e3 runtime-reuse probe: executes the e3 contract query and counts
  * ReusedExchange / reused query stages in the FINAL adaptive plan — the
  * static plan shows the self-join subtrees duplicated, but AQE may be
  * deduplicating them at runtime (in which case a checkpoint would buy
  * nothing). */
object E3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("e3probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("e3_near_dup")(spark, sfDir)
      df.collect()
      val w = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val reused = "ReusedExchange|ReusedSubquery|reused".r.findAllIn(plan).size
      val scans = "Scan parquet".r.findAllIn(plan).size
      val stages = "ShuffleQueryStage|BroadcastQueryStage".r.findAllIn(plan).size
      println(f"[e3] rep=$rep wall=$w%.2fs reusedNodes=$reused parquetScans=$scans queryStages=$stages")
    }
    spark.stop()
  }
}
