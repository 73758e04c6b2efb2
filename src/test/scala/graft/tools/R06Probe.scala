package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 optimization probe (Test/runMain graft.tools.R06Probe
  * [sfDir] [queryRegex] [reps] [plansDir]):
  *
  * Times SparkEntry contract queries with the EXACT session configuration
  * and action the frozen Bench uses (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, 16 MB scan splits, `.count()` as the action), so
  * walls here are comparable to the driver's BENCH numbers — without
  * paying for the scaling protocol or the full 49-query sweep on every
  * iteration. Optionally dumps each query's formatted physical plan to
  * `<plansDir>/<name>.txt` (the plans/r06 before/after evidence).
  */
object R06Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val pattern = if (args.length > 1) args(1) else ".*"
    val reps = if (args.length > 2) args(2).toInt else 1
    val plansDir = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("r06-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", 16L * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => name.matches(pattern) }
    plansDir.foreach(d => new java.io.File(d).mkdirs())
    selected.foreach { case (name, fn) =>
      plansDir.foreach { d =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch { case e: Throwable =>
          System.err.println(s"[r06] plan dump failed for $name: $e")
        }
      }
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, sfDir).count()
          val w = (System.nanoTime() - t0) / 1e9
          (w, n)
        } catch { case e: Throwable =>
          System.err.println(s"[r06] $name FAILED: $e")
          (-1.0, -1L)
        }
      }
      val ws = walls.map(_._1).filter(_ >= 0).sorted
      val med = if (ws.isEmpty) -1.0 else ws(ws.size / 2)
      println(f"[r06] $name%-24s median=${med}%.3f s  all=${walls.map(w => f"${w._1}%.3f").mkString(",")} rows=${walls.head._2}")
    }
    spark.stop()
  }
}
