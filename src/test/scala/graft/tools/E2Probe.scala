package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: print the e2 self-certifying recall rows at sf0.01. */
object E2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("e2_ann_lsh")(spark, "/root/testdata/sf0.01")
    df.orderBy("q_id", "rank").show(50, truncate = false)
    spark.stop()
  }
}
