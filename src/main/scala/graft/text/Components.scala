package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * `localCheckpoint` to truncate lineage; convergence is detected by the
  * monotonically decreasing label sum (labels only ever decrease, so an
  * unchanged sum is a fixpoint — no row-diff join needed).
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
    // per-round joins are small and fixed-shape — plan them statically and
    // restore the session settings afterwards (same concurrency caveat as
    // knnJoin: flips are session-wide for the loop's duration).
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufWas = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    loopShufflePartitions.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    try connectedComponentsLoop(edges, aCol, bCol, maxIter)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", shufWas)
    }
  }

  private def connectedComponentsLoop(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    // per-iteration localCheckpoints pin executor blocks — free everything
    // this call created except the returned result's own blocks (the same
    // round-1 leak knnJoin fixes)
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    def freeSince(boundary: scala.collection.Set[Int]): Unit = {
      val toFree = boundary -- preexisting
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (toFree.contains(id)) rdd.unpersist(blocking = false)
      }
    }
    val sym = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(edges.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var checksum = labels.agg(coalesce(sum("comp"), lit(0L))).head.getLong(0)
    var it = 0
    while (it < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy("src").agg(min("comp").as("_nm"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(col("comp"), coalesce(col("_nm"), col("comp"))).as("comp"))
      // One pointer jump per round (comp ← min(comp, comp∘comp)); measured:
      // a second jump in the same plan recomputes the unmaterialized
      // `stepped` subtree 4× and nearly doubles the round's wall — fewer
      // rounds did NOT beat the recompute. LAZY checkpoint: the
      // convergence-check aggregation below is the action that materializes
      // it — one Spark job per round instead of two.
      val jumped = stepped.as("a")
        .join(stepped.select(col("id").as("_jid"), col("comp").as("_jcomp")).as("b"),
          col("a.comp") === col("_jid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.comp"), coalesce(col("_jcomp"), col("a.comp"))).as("comp"))
        .localCheckpoint(eager = false)
      val s = jumped.agg(coalesce(sum("comp"), lit(0L))).head.getLong(0)
      labels = jumped
      it += 1
      if (s == checksum) {
        // materialize the result's own blocks, then free every block this
        // call created before it (per-iteration checkpoints would otherwise
        // accumulate — the round-1 knnJoin leak)
        val beforeFinal = spark.sparkContext.getPersistentRDDs.keySet
        val out = labels.select(col("id"), col("comp").as("component")).localCheckpoint()
        freeSince(beforeFinal)
        return out
      }
      checksum = s
    }
    freeSince(spark.sparkContext.getPersistentRDDs.keySet)
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations")
  }
}
