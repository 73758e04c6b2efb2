package graft.tools
import org.apache.spark.sql.SparkSession
object StagedReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("p")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/tmp/staged-probe/_staged"
    graft.util.HadoopIO.delete("/tmp/staged-probe", spark.sessionState.newHadoopConf())
    Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("v", "_bucket")
      .write.partitionBy("_bucket").parquet(dir)
    val back = spark.read.parquet(dir)
    println("PROBE rows=" + back.count() + " pruned=" + back.where($"_bucket" === 10L).count())
    println("PROBE plan=" + back.where($"_bucket" === 10L).queryExecution.executedPlan.toString.linesIterator.find(_.contains("PartitionFilters")).getOrElse("?"))
    spark.stop()
  }
}
