package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SessionBridge

/** Connected components over a pair/edge list — the step that turns the
  * dedup operators' PAIRS (minhash/simhash/embedding near-dup, exact-dup
  * chains) into duplicate CLUSTERS with a canonical representative (the
  * minimum id reachable), which is what a cleaning pass actually keys on.
  *
  * Algorithm: min-label propagation with POINTER JUMPING — each iteration
  * takes (1) the minimum label over the node's neighbors and (2) the label
  * OF its current label (path shortcutting), so chains of length n converge
  * in O(log n) iterations, not O(n). Each iteration is two hash-join
  * shuffles over (edges ⋈ labels) + (labels ⋈ labels) with a
  * `localCheckpoint` to truncate lineage; convergence is detected by
  * counting CHANGED labels in the same per-round aggregation (zero changes
  * = fixpoint — overflow-free, unlike a label-sum checksum, which can wrap
  * with ids near Long.MaxValue and alias a changed labeling to "unchanged").
  */
object Components {

  /** Components of the undirected graph given by `edges`.
    * @return (id, component) for every node INCIDENT TO AN EDGE; component
    *         is the minimum node id in the connected component. Isolated
    *         nodes (no edges) are not rows — callers left-join and coalesce
    *         to the node's own id, matching the dedup convention that an
    *         unpaired doc is its own canonical copy.
    * @throws IllegalStateException if `maxIter` iterations do not reach the
    *         fixpoint (at the default 25, pointer jumping covers diameters
    *         beyond 2^25 — hitting this means the input is pathological,
    *         and an unconverged labeling must not be returned silently) */
  /** @param loopShufflePartitions shuffle partitioning for the loop's joins
    *        (None = session setting). The label frame is one row per node —
    *        usually far smaller than the session's data-sized default, and
    *        with AQE off nothing coalesces it, so per-round task overhead
    *        scales with this knob. Size it to the node count / executor
    *        fleet, not to the corpus. */
  def connectedComponents(edges: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 25, loopShufflePartitions: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    // Same discipline as SpatialJoin.knnJoin: AQE re-plans every round of a
    // driver-side iterative loop and has been observed (Spark 4.1.2 local)
    // to stall in withFinalPlanUpdate on checkpointed iterations. The
    // per-round joins are small and fixed-shape — plan them statically. The
    // flips live on a CLONED session (same context + cache, isolated conf),
    // so a concurrent query on the caller's session never sees them; the
    // result is re-rooted onto the caller's session before returning.
    val loop = SessionBridge.cloneSession(spark)
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    loopShufflePartitions.foreach(p => loop.conf.set("spark.sql.shuffle.partitions", p.toString))
    val out = connectedComponentsLoop(SessionBridge.ofRows(loop, edges), aCol, bCol, maxIter)
    SessionBridge.ofRows(spark, out)
  }

  private def connectedComponentsLoop(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    // per-iteration localCheckpoints pin executor blocks — free exactly the
    // blocks THIS call's checkpoints created, except the returned result's
    // own (CheckpointTracker scaladoc)
    val ckpt = new graft.util.CheckpointTracker(spark)
    import ckpt.track
    val sym = track(edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(edges.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint())
    var labels = track(sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint())
    var it = 0
    // the finally frees this call's pinned blocks on EVERY exit — the two
    // normal ones AND a mid-loop Spark action failure (executor loss on
    // iteration k would otherwise leave k checkpointed label frames pinned,
    // the round-1 knnJoin leak this tracker exists to prevent)
    var result: DataFrame = null
    try {
    while (it < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy("src").agg(min("comp").as("_nm"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), labels("comp").as("_prev"),
          least(col("comp"), coalesce(col("_nm"), col("comp"))).as("comp"))
      // One pointer jump per round (comp ← min(comp, comp∘comp)); measured:
      // a second jump in the same plan recomputes the unmaterialized
      // `stepped` subtree 4× and nearly doubles the round's wall — fewer
      // rounds did NOT beat the recompute. LAZY checkpoint: the
      // convergence-check aggregation below is the action that materializes
      // it — one Spark job per round instead of two. `_prev` (the label at
      // round start) rides along so convergence is a changed-row COUNT in
      // the same aggregation — exact at any id magnitude.
      val jumped = track(stepped.as("a")
        .join(stepped.select(col("id").as("_jid"), col("comp").as("_jcomp")).as("b"),
          col("a.comp") === col("_jid"), "left")
        .select(col("a.id").as("id"), col("a._prev").as("_prev"),
          least(col("a.comp"), coalesce(col("_jcomp"), col("a.comp"))).as("comp"))
        .localCheckpoint(eager = false))
      val changed = jumped
        .agg(coalesce(sum(when(col("comp") =!= col("_prev"), 1L).otherwise(0L)), lit(0L)))
        .head.getLong(0)
      labels = jumped.select("id", "comp")
      it += 1
      if (changed == 0L) {
        // materialize the result's own blocks; the finally below frees the
        // rest
        result = labels.select(col("id"), col("comp").as("component")).localCheckpoint()
        return result
      }
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations")
    } finally {
      if (result != null) ckpt.freeAllExcept(result)
      else ckpt.freeAllExcept(Set.empty[Int])
    }
  }
}
