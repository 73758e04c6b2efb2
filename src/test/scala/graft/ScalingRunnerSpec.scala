package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-2 bench gate died on this exact seam: scaling child JVMs
  * inherited the parent's environment-sized `-Xms`/`-Xmx` (~90 GiB under
  * the driver's SPARK_DRIVER_MEM) plus `-XX:+AlwaysPreTouch`, so parent +
  * child pre-touched ~180 GiB on a 125 GiB box and the OOM killer fired at
  * the first child's SparkContext startup (BENCH_r02.json rc=1, exit 137).
  * These tests pin the child-arg construction so that regression cannot
  * silently return. */
class ScalingRunnerSpec extends AnyFunSuite {

  private val parentArgs = Seq(
    "--add-opens", "java.base/java.lang=ALL-UNNAMED",
    "-Dspark.ui.enabled=false",
    "-Xmx92160m", "-Xms92160m",
    "-XX:+AlwaysPreTouch", "-XX:+UseParallelGC",
    "-agentlib:jdwp=transport=dt_socket")

  test("child args drop the parent's heap sizing and agentlib, keep the rest") {
    val child = ScalingRunner.childJvmArgs(parentArgs, cores = 8, heapGb = 16)
    assert(!child.exists(a => a.startsWith("-agentlib")))
    // the parent's 90 GiB heap flags are gone...
    assert(!child.contains("-Xmx92160m") && !child.contains("-Xms92160m"))
    // ...replaced by exactly one bounded, pre-touched heap
    assert(child.count(_.startsWith("-Xmx")) === 1)
    assert(child.count(_.startsWith("-Xms")) === 1)
    assert(child.contains("-Xmx16g") && child.contains("-Xms16g"))
    assert(child.count(_ == "-XX:+AlwaysPreTouch") === 1)
    // non-heap flags survive (GC choice, add-opens, -D system props)
    assert(child.contains("-XX:+UseParallelGC"))
    assert(child.contains("-Dspark.ui.enabled=false"))
    assert(child.containsSlice(Seq("--add-opens", "java.base/java.lang=ALL-UNNAMED")))
    assert(child.contains("-XX:ActiveProcessorCount=8"))
  }

  test("child heap is bounded: 4..16 GiB and at most half of MemAvailable") {
    val gb = ScalingRunner.childHeapGb()
    assert(gb >= 4L && gb <= 16L)
  }
}
