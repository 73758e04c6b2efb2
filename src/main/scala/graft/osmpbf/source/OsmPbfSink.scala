package graft.osmpbf.source

import graft.osmpbf.codec.PbfWriter
import graft.osmpbf.model._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PBF sink (S8 — the reference is read-only; a write path makes the
  * library round-trip complete). Each Spark partition writes its own
  * `part-NNNNN.osm.pbf` file into the target directory — the standard
  * distributed-sink layout, readable back through the `osmpbf` source's
  * directory scan. Per-partition files are fully independent (own header,
  * own string tables), so the write needs no coordination beyond mkdir.
  */
object OsmPbfSink {

  /** Write nodes (and optionally ways/relations) to `dir`. Elements should
    * be pre-partitioned however the caller wants files split (e.g.
    * SpatialJoin.repartitionByCellPrefix for spatial locality). */
  def write(nodes: Dataset[OsmNode], ways: Dataset[OsmWay],
      relations: Dataset[OsmRelation], dir: String,
      granularity: Long = 100L, compress: Boolean = true): Unit = {
    new java.io.File(dir).mkdirs()
    def path(kind: String, pid: Int) = f"$dir/part-$kind-$pid%05d.osm.pbf"
    nodes.foreachPartition { (it: Iterator[OsmNode]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new PbfWriter(path("n", pid), granularity = granularity, compress = compress)
        it.foreach(w.addNode)
        w.close()
      }
    }
    ways.foreachPartition { (it: Iterator[OsmWay]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new PbfWriter(path("w", pid), granularity = granularity, compress = compress)
        it.foreach(w.addWay)
        w.close()
      }
    }
    relations.foreachPartition { (it: Iterator[OsmRelation]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new PbfWriter(path("r", pid), granularity = granularity, compress = compress)
        it.foreach(w.addRelation)
        w.close()
      }
    }
  }
}
