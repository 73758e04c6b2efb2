package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession across all suites (getOrCreate). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "4g")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.spark
  lazy val tmpDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-test").toFile
    d.deleteOnExit()
    d.toString
  }
}
