package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-phase walls of the d5_minhash_lsh contract query, cold in a fresh
  * JVM with the exact Bench session config — where do the ~2.5–2.8 s go?
  * (Test/runMain graft.tools.D5Probe [sfDir])
  */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("d5-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", 16L * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d5] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = t("read documents (count)") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet"); d.count(); d
    }
    val cands = t("minhashLsh + checkpoint") {
      graft.text.Dedup.minhashLsh(docs, threshold = 0.5).localCheckpoint()
    }
    t("cands count")(cands.count())
    val jac = t("ngramJaccard build")(
      graft.text.Dedup.ngramJaccard(cands.select("a_id", "b_id"), docs)
        .withColumnRenamed("jaccard", "exact_jaccard"))
    t("jaccard + final join count")(jac.join(cands, Seq("a_id", "b_id")).count())
    spark.stop()
  }
}
