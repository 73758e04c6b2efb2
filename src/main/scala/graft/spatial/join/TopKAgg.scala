package graft.spatial.join

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-by-distance aggregate for kNN ranking.
  *
  * The naive plan (`row_number() OVER (PARTITION BY pt ORDER BY dist)`)
  * shuffles EVERY candidate row to sort them — at 100 TB that is the
  * dominant cost (observed locally: 75M candidate rows shuffled to keep
  * k=2 per point). As an `Aggregator`, Catalyst runs `reduce` map-side, so
  * each partition forwards at most k rows per point into the shuffle —
  * the partial/final split the reference's par_map_reduce contract
  * describes (reader.rs:264-302).
  *
  * Buffer is a distance-sorted Seq of ≤ k (dist, id) pairs; duplicate ids
  * are dropped (cell-disk probes can alias at the antimeridian). Ties
  * break by id, matching the window-based oracle.
  */
final case class KnnCand(dist: Double, id: Long)

/** Nullable input view (round-6): the kNN loop now unions one synthetic
  * keep-alive row per active point into the candidate set (null dist/id),
  * so points whose probed disk matched nothing still form a group — which
  * lets the next-active set derive from the round's ONE checkpointed
  * aggregate instead of paying an anti-join + a second checkpoint per
  * round. `reduce` skips null candidates, so the aggregate's output is
  * unchanged for every real candidate stream. */
final case class KnnCandIn(dist: java.lang.Double, id: java.lang.Long)

class TopKAgg(k: Int) extends Aggregator[KnnCandIn, Seq[KnnCand], Seq[KnnCand]] {
  // fail on the driver at construction, not as a per-row NoSuchElementException
  // (buf.last on empty) deep inside executor-side shuffle tasks
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Seq[KnnCand] = Vector.empty

  // NaN-AWARE ordering (Double.compare ranks NaN greatest, NaN == NaN):
  // with raw </==, every comparison against a NaN distance is false, so a
  // NaN candidate (one POI with corrupt coordinates) inserted at position
  // 0 and was reported as the rank-1 nearest neighbour — the window
  // oracle this aggregator must match sorts NaN LAST.
  private def cmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)

  private def insert(buf: Seq[KnnCand], c: KnnCand): Seq[KnnCand] = {
    // O(1) reject for the common case: buffer full and candidate sorts
    // after the current k-th — no allocation on the hot path
    if (buf.size == k) {
      val last = buf.last
      if (cmp(c.dist, last.dist) > 0 || (cmp(c.dist, last.dist) == 0 && c.id >= last.id)) return buf
    }
    if (buf.exists(_.id == c.id)) buf
    else {
      // buf is already sorted: single-position insertion, no re-sort
      var pos = 0
      while (pos < buf.size &&
        (cmp(buf(pos).dist, c.dist) < 0 ||
          (cmp(buf(pos).dist, c.dist) == 0 && buf(pos).id < c.id))) pos += 1
      val merged = (buf.take(pos) :+ c) ++ buf.drop(pos)
      if (merged.size > k) merged.take(k) else merged
    }
  }

  override def reduce(buf: Seq[KnnCand], c: KnnCandIn): Seq[KnnCand] =
    if (c == null || c.dist == null || c.id == null) buf // keep-alive / unmatched probe
    else insert(buf, KnnCand(c.dist, c.id))

  override def merge(a: Seq[KnnCand], b: Seq[KnnCand]): Seq[KnnCand] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[KnnCand]): Seq[KnnCand] = r

  override def bufferEncoder: Encoder[Seq[KnnCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KnnCand]]()
  override def outputEncoder: Encoder[Seq[KnnCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KnnCand]]()
}
