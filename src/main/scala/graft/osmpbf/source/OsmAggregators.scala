package graft.osmpbf.source

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators — the Spark-native form of the reference's
  * `par_map_reduce` contract (reader.rs:264-302: user map, identity,
  * associative reduce; 4-arg chunk/cross-chunk variant
  * reader_integration.rs:136-145). Catalyst's HashAggregateExec runs
  * `reduce` map-side per partition (the per-chunk fold) and `merge` at the
  * final stage (the cross-chunk combine) — the split the reference only
  * documents, with the sequential≡parallel equality guaranteed by
  * associativity (asserted in AggregatorSpec).
  */
object OsmAggregators {

  /** (minLon, minLat, maxLon, maxLat, count) bbox accumulator over points. */
  final case class BBoxAcc(minLon: Double, minLat: Double,
      maxLon: Double, maxLat: Double, n: Long)

  /** Geographic bbox + count of a Dataset of (lon, lat) pairs — the
    * HeaderBBox computation (header_block.rs:23-31) as a one-pass fold. */
  val bboxAgg: Aggregator[(Double, Double), BBoxAcc, BBoxAcc] =
    new Aggregator[(Double, Double), BBoxAcc, BBoxAcc] {
      override def zero: BBoxAcc = BBoxAcc(180.0, 90.0, -180.0, -90.0, 0L)
      override def reduce(b: BBoxAcc, p: (Double, Double)): BBoxAcc =
        BBoxAcc(math.min(b.minLon, p._1), math.min(b.minLat, p._2),
          math.max(b.maxLon, p._1), math.max(b.maxLat, p._2), b.n + 1)
      override def merge(a: BBoxAcc, b: BBoxAcc): BBoxAcc =
        BBoxAcc(math.min(a.minLon, b.minLon), math.min(a.minLat, b.minLat),
          math.max(a.maxLon, b.maxLon), math.max(a.maxLat, b.maxLat), a.n + b.n)
      // zero input: the fold sentinel is an INVERTED box (min > max) that a
      // caller could mistake for a real result — surface NaN bounds instead,
      // which poison any downstream geometry visibly (n = 0 stays the
      // machine-checkable emptiness signal)
      override def finish(r: BBoxAcc): BBoxAcc =
        if (r.n == 0L) BBoxAcc(Double.NaN, Double.NaN, Double.NaN, Double.NaN, 0L) else r
      override def bufferEncoder: Encoder[BBoxAcc] = Encoders.product[BBoxAcc]
      override def outputEncoder: Encoder[BBoxAcc] = Encoders.product[BBoxAcc]
    }

  /** Wrapping-u64 checksum over byte arrays (the reference's benchmark fold,
    * mmap_blob_integration.rs:38-45) — commutative monoid, so map-side
    * partials are exact. */
  val checksumAgg: Aggregator[Array[Byte], Long, Long] =
    new Aggregator[Array[Byte], Long, Long] {
      override def zero: Long = 0L
      override def reduce(acc: Long, bytes: Array[Byte]): Long = {
        var h = acc
        var i = 0
        while (i < bytes.length) { h += (bytes(i) & 0xffL); i += 1 }
        h
      }
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
