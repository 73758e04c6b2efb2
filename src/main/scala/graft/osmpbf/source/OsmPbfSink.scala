package graft.osmpbf.source

import graft.osmpbf.codec.PbfWriter
import graft.osmpbf.model._
import graft.util.{HadoopIO, SerializableHadoopConf}

import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** PBF sink (S8 — the reference is read-only; a write path makes the
  * library round-trip complete). Each Spark partition writes its own
  * `part-NNNNN.osm.pbf` file into the target directory — the standard
  * distributed-sink layout, readable back through the `osmpbf` source's
  * directory scan. Per-partition files are fully independent (own header,
  * own string tables), so the write needs no coordination beyond mkdir.
  *
  * Cluster-safe: all IO goes through the Hadoop FileSystem API with the
  * session's conf (S3/HDFS credentials included), and each task streams to
  * an attempt-scoped temp path renamed into place on success — retried or
  * speculative tasks can never interleave bytes or leave partial final
  * files (round-1 ADVICE: java.io.FileOutputStream to final names wrote to
  * executor-local disks and had no commit protocol).
  */
object OsmPbfSink {

  private def writePartition[T](dir: String, kind: String, conf: SerializableHadoopConf,
      granularity: Long, compress: Boolean)(it: Iterator[T])(add: (PbfWriter, T) => Unit): Unit =
    if (it.hasNext) {
      val tc = TaskContext.get()
      val pid = tc.partitionId()
      val fileName = f"part-$kind-$pid%05d.osm.pbf"
      // committing a part file invalidates any same-named sidecar from a
      // previous run, so drop it HERE (every creation path) — the driver's
      // overwrite branch alone leaves a hole: a crash between its part-file
      // and sidecar deletes, or a fresh write into a dir whose old part file
      // already vanished, pairs the OLD run's counts/zone maps with the new
      // bytes (loadSidecar's only staleness guard is byte-size equality).
      // Deleted BEFORE the write so no crash window exists after commit; a
      // lost temp-file race never re-deletes (losers skip straight to keep).
      try HadoopIO.fileSystem(dir, conf.value)
        .delete(new org.apache.hadoop.fs.Path(dir, fileName + ".graft-stats.json"), false)
      catch { case _: Exception => () }
      HadoopIO.writeAtomic(dir, fileName, conf.value, tc.taskAttemptId()) { out =>
        val w = new PbfWriter(new java.io.BufferedOutputStream(out, 1 << 16),
          granularity = granularity, compress = compress)
        it.foreach(add(w, _))
        w.close()
      }
    }

  /** Write nodes (and optionally ways/relations) to `dir`. Elements should
    * be pre-partitioned however the caller wants files split (e.g.
    * SpatialJoin.repartitionByCellPrefix for spatial locality).
    *
    * Overwrite semantics (parquet-writer discipline): a target already
    * holding `part-*.osm.pbf` files FAILS unless `overwrite = true`, which
    * deletes them first. Without this, rewriting into a directory with a
    * previous run's HIGHER partition count silently mixed stale part files
    * into every later directory read — per-partition rename-commit only
    * replaces files the new run also produces. */
  def write(nodes: Dataset[OsmNode], ways: Dataset[OsmWay],
      relations: Dataset[OsmRelation], dir: String,
      granularity: Long = 100L, compress: Boolean = true,
      overwrite: Boolean = false): Unit = {
    val spark = nodes.sparkSession
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val fs = HadoopIO.fileSystem(dir, conf.value)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(dirPath)) {
      val stale = fs.listStatus(dirPath).filter(s => s.isFile && {
        val n = s.getPath.getName
        n.startsWith("part-") && n.endsWith(".osm.pbf")
      })
      if (stale.nonEmpty) {
        if (!overwrite) throw new java.io.IOException(
          s"osmpbf sink target $dir already holds ${stale.length} part file(s); " +
            "pass overwrite=true to replace them (mixing would corrupt directory reads)")
        stale.foreach { s =>
          fs.delete(s.getPath, false)
          // drop the orphaned sidecar with its part file (tasks also delete
          // same-named sidecars at commit — see writePartition — but parts
          // the new run does NOT reproduce would leave theirs behind).
          // No exists() pre-check: delete on a missing path returns false
          // without throwing, and the extra HEAD doubles S3A round trips.
          fs.delete(new org.apache.hadoop.fs.Path(
            s.getPath.getParent, s.getPath.getName + ".graft-stats.json"), false)
        }
      }
    }
    HadoopIO.fileSystem(dir, conf.value).mkdirs(new org.apache.hadoop.fs.Path(dir))
    nodes.foreachPartition { (it: Iterator[OsmNode]) =>
      writePartition(dir, "n", conf, granularity, compress)(it)(_ addNode _)
    }
    ways.foreachPartition { (it: Iterator[OsmWay]) =>
      writePartition(dir, "w", conf, granularity, compress)(it)(_ addWay _)
    }
    relations.foreachPartition { (it: Iterator[OsmRelation]) =>
      writePartition(dir, "r", conf, granularity, compress)(it)(_ addRelation _)
    }
  }
}
