package graft.text

import graft.SparkTestBase

import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cliques and bridges resolve to min-id components") {
    val m = comps(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),       // chain
      (10L, 11L),                          // pair
      (20L, 21L), (21L, 22L), (20L, 22L),  // clique
      (22L, 30L)))                         // bridge merges 30 into the clique
    assert(m === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 20L))
  }

  test("long chain converges via pointer jumping (O(log n) iterations)") {
    // a 300-node chain has diameter 299: naive min-propagation needs ~299
    // rounds and would blow the 25-iteration guard — pointer jumping must
    // finish well inside it
    val edges = (1L until 300L).map(i => (i, i + 1))
    val m = comps(edges)
    assert(m.size === 300)
    assert(m.values.toSet === Set(1L))
  }

  test("empty edge list yields empty labeling, not an error") {
    assert(comps(Seq.empty) === Map.empty)
  }

  test("iteration checkpoints are freed: only the result's blocks remain") {
    val before = spark.sparkContext.getPersistentRDDs.size
    comps((1L until 100L).map(i => (i, i + 1)))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"leaked checkpoint blocks: $before -> $after")
  }
}
