package graft.pipeline

import graft.spatial.cell.{functions => F}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Checkpoint/resume batch runner with per-partition lineage + metrics
  * (north_rule: "resumable from checkpoint with per-partition lineage +
  * metrics").
  *
  * The input is bucketed by coarse cell prefix (`cell_parent(tile,
  * bucketRes)`) — spatially coherent units of work, the batch analog of the
  * reference's osmosis replication sequence numbers (header_block.rs:33-71):
  * a monotonically checkpointable progress marker. Each bucket writes
  *   <out>/bucket=<cell>/        (parquet output)
  *   <out>/_ckpt/<cell>.json     (lineage: input snapshot, rows, wall ms)
  * and a resumed run skips buckets whose marker exists and is valid.
  *
  * Buckets are independent Spark jobs; within a bucket all parallelism is
  * Spark-task-level. Failure mid-run loses at most one bucket's work.
  */
object CheckpointedRunner {

  final case class BucketResult(bucket: Long, rows: Long, wallMs: Long, skipped: Boolean)

  def markerPath(outDir: String, bucket: Long): java.nio.file.Path =
    Paths.get(s"$outDir/_ckpt/$bucket.json")

  def isDone(outDir: String, bucket: Long): Boolean = {
    val p = markerPath(outDir, bucket)
    Files.exists(p) && {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      s.contains("\"complete\":true")
    }
  }

  /** Run `work` once per bucket of `tiled` (a DataFrame with a `tile`
    * column), checkpointing each. `work` receives the bucket's slice and
    * must return the DataFrame to persist.
    *
    * @param lineage opaque provenance string recorded in every marker
    *                (e.g. input snapshot id + code version)
    */
  def run(spark: SparkSession, tiled: DataFrame, outDir: String,
      work: DataFrame => DataFrame, bucketRes: Int = 2,
      lineage: String = "unspecified",
      failInjector: Long => Unit = _ => ()): Seq[BucketResult] = {
    Files.createDirectories(Paths.get(s"$outDir/_ckpt"))
    val withBucket = tiled.withColumn("_bucket", F.cell_parent(col("tile"), bucketRes))
    val buckets = withBucket.select("_bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    val results = buckets.map { b =>
      if (isDone(outDir, b)) BucketResult(b, -1L, 0L, skipped = true)
      else {
        val t0 = System.nanoTime()
        try {
          failInjector(b) // test hook: simulate a crash mid-run
          val slice = withBucket.where(col("_bucket") === b).drop("_bucket")
          val out = work(slice)
          out.write.mode("overwrite").parquet(s"$outDir/bucket=$b")
          val rows = spark.read.parquet(s"$outDir/bucket=$b").count()
          val wallMs = (System.nanoTime() - t0) / 1000000
          val marker =
            s"""{"bucket":$b,"complete":true,"rows":$rows,"wall_ms":$wallMs,
               |"lineage":"$lineage","bucket_res":$bucketRes}""".stripMargin
          Files.write(markerPath(outDir, b), marker.getBytes(StandardCharsets.UTF_8))
          BucketResult(b, rows, wallMs, skipped = false)
        } catch {
          case NonFatal(e) =>
            // no marker written → next run redoes this bucket
            throw e
        }
      }
    }.toSeq
    // aggregate metrics for the whole run
    val done = results.filterNot(_.skipped)
    val metrics =
      s"""{"buckets_total":${buckets.length},"buckets_run":${done.length},
         |"buckets_skipped":${results.count(_.skipped)},
         |"rows":${done.map(_.rows).sum},"wall_ms":${done.map(_.wallMs).sum},
         |"lineage":"$lineage"}""".stripMargin
    Files.write(Paths.get(s"$outDir/_pipeline_metrics.json"),
      metrics.getBytes(StandardCharsets.UTF_8))
    results
  }

  /** Read back all bucket outputs as one DataFrame. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/bucket=*")
}
