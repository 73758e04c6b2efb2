ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmpbfspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to this process's stdout/stderr instead of
// through sbt's logger: the "[info] " prefix sbt adds otherwise broke the
// driver's machine-parse of Bench's JSON line (BENCH_r01.json parsed: null).
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap for forked runs: honor SPARK_DRIVER_MEM but CAP it at 12 GiB. The
// bench parent pre-touches its whole heap (-Xms + AlwaysPreTouch below) and
// then spawns fresh child JVMs for the scaling protocol; with an
// environment-sized heap (the driver sets SPARK_DRIVER_MEM near machine
// size, ~90g) parent + child out-committed the 125 GiB guest and the OOM
// killer ended BENCH_r02 (exit 137). The full 44-query sf0.1 phase runs
// green at the 8g default (all of round 2 ran there), so 12 GiB is a 1.5x
// margin, parent(12) + scaling child(<=16, bounded in ScalingRunner) always
// fits, and the rest of RAM stays page cache for the 4.4 GB image fixture.
val forkedHeap: String = {
  val spec = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim
  val m = "(?i)^(\\d+)\\s*([gm])b?$".r
  spec match {
    case m(n, u) =>
      val mb = if (u.equalsIgnoreCase("g")) n.toLong * 1024 else n.toLong
      // always emit the canonical JVM form: the regex accepts "8gb"/"8 g",
      // which -Xmx would reject verbatim
      if (mb > 12 * 1024) "12g" else s"${mb}m"
    case _ => "8g"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkedHeap",
  // preallocate the heap: heap-growth pauses otherwise dominate the first
  // timed iteration of CPU benchmarks and poison scaling measurements
  s"-Xms$forkedHeap",
  "-XX:+AlwaysPreTouch", // page-zeroing at JVM start, not mid-benchmark
  "-XX:+UseParallelGC",  // batch throughput > pause time for this workload
)
