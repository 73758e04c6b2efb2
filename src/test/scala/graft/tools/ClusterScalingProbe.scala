package graft.tools

import graft.ScalingRunner
import graft.fixtures.OsmWorld

/** Supplementary north-rule evidence: the SAME scaling job measured under
  * `local-cluster` masters — real separate executor JVMs (worker-spawned
  * processes, netty shuffle, executor-side class loading) instead of
  * in-process local[N] threads. Two cluster sizes: 2 executors × 1 core vs
  * 8 executors × 1 core (the N → 4N shape). Requires the bench image
  * fixture to exist (run graft.Bench once first).
  *
  * Prints one line: CLUSTER_SCALING {...} with both throughputs and the
  * efficiency, mirroring the bench JSON fields.
  */
object ClusterScalingProbe {
  def main(args: Array[String]): Unit = {
    val tmp = sys.props("java.io.tmpdir")
    val benchWorldNodes = sys.env.getOrElse("GRAFT_BENCH_WORLD_NODES", "3000").toInt
    val benchImages = sys.env.getOrElse("GRAFT_BENCH_IMAGES", "4800000").toLong
    val (pbfPath, _) = OsmWorld.cachedPbf(s"$tmp/graft-fixtures", 42L, 8, benchWorldNodes)
    val imgPath = s"$tmp/graft-fixtures/bench_images_$benchImages"
    require(new java.io.File(s"$imgPath/_SUCCESS").exists(),
      s"bench image fixture missing at $imgPath — run graft.Bench first")
    def level(executors: Int): (Double, Long) = {
      val res = ScalingRunner.spawn(executors, imgPath, pbfPath, benchWorldNodes,
        master = Some(s"local-cluster[$executors,1,3072]"))
      System.err.println(f"[cluster-probe] $executors executors: median=${res._1}%.2fs rows=${res._2}")
      res
    }
    val (secLow, rowsLow) = level(2)
    val (secHigh, rowsHigh) = level(8)
    val eff = ((rowsHigh / secHigh) / (rowsLow / secLow)) / 4.0
    println(
      s"""CLUSTER_SCALING {"executors_low":2,"executors_high":8,"cores_per_executor":1,""" +
        s""""sec_low":$secLow,"sec_high":$secHigh,"rows":$rowsHigh,""" +
        s""""rows_per_s_low":${rowsLow / secLow},"rows_per_s_high":${rowsHigh / secHigh},""" +
        s""""efficiency":$eff}""")
  }
}
