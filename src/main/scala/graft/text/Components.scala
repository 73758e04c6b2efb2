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
  def connectedComponents(edges: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 25): DataFrame = {
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
      val jumped = stepped.as("a")
        .join(stepped.select(col("id").as("_jid"), col("comp").as("_jcomp")).as("b"),
          col("a.comp") === col("_jid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.comp"), coalesce(col("_jcomp"), col("a.comp"))).as("comp"))
        .localCheckpoint()
      val s = jumped.agg(coalesce(sum("comp"), lit(0L))).head.getLong(0)
      labels = jumped
      it += 1
      if (s == checksum) return labels.select(col("id"), col("comp").as("component"))
      checksum = s
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations")
  }
}
