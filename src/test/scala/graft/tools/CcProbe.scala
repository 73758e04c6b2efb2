package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** d12 phase probe: times the edge derivation vs the connected-components
  * loop separately (GRAFT_CC_VERBOSE=1 adds per-check round timings). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("ccprobe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val fp = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), graft.text.TextAnalysis.tokenCount(col("text")).as("f"))
      val w = Window.partitionBy("f").orderBy("doc_id")
      val edges = fp.withColumn("nxt", lead("doc_id", 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("doc_id").as("a_id"), col("nxt").as("b_id"))
        .localCheckpoint()
      val t1 = System.nanoTime()
      val n = graft.text.Components.connectedComponents(edges, loopShufflePartitions = Some(8))
        .count()
      val t2 = System.nanoTime()
      println(f"[cc-probe] rep=$rep edges=${(t1 - t0) / 1e9}%.2fs loop=${(t2 - t1) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
