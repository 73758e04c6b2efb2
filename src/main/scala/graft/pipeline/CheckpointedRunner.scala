package graft.pipeline

import graft.spatial.cell.{functions => F}
import graft.util.HadoopIO

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume batch runner with per-partition lineage + metrics
  * (north_rule: "resumable from checkpoint with per-partition lineage +
  * metrics").
  *
  * The input is bucketed by coarse cell prefix (`cell_parent(tile,
  * bucketRes)`) — spatially coherent units of work, the batch analog of the
  * reference's osmosis replication sequence numbers (header_block.rs:33-71):
  * a monotonically checkpointable progress marker.
  *
  * Scale shape (fixed from round 1, which re-scanned the FULL input once per
  * bucket and re-read every bucket's output just to count it):
  *   1. the bucketed input is staged ONCE via `write.partitionBy("_bucket")`
  *      — each bucket's slice is then a partition-PRUNED read (verified:
  *      `PartitionFilters` in the scan), so B buckets cost one scan + one
  *      write, not B scans;
  *   2. per-bucket row counts come from an `Observation` attached to the
  *      output write — no read-back;
  *   3. all markers/metrics go through the Hadoop FileSystem API, so the
  *      checkpoint state lives next to the output on HDFS/S3, not on the
  *      driver's local disk.
  *
  * Layout:
  *   <out>/staged_input/_bucket=<cell>/   (bucket-partitioned input copy)
  *   <out>/bucket=<cell>/            (parquet output per bucket)
  *   <out>/_ckpt/<cell>.json         (lineage: input snapshot, rows, wall ms)
  *
  * Buckets are independent Spark jobs; failure mid-run loses at most one
  * bucket's work, and a resumed run skips buckets whose marker is valid.
  */
object CheckpointedRunner {

  final case class BucketResult(bucket: Long, rows: Long, wallMs: Long, skipped: Boolean)

  def markerPath(outDir: String, bucket: Long): String = s"$outDir/_ckpt/$bucket.json"

  /** A bucket is done only if its marker says complete AND was written by
    * the SAME lineage and bucket resolution as the current run — a marker
    * from an older lineage must not validate (its output is stale). */
  def isDone(outDir: String, bucket: Long, lineage: String, bucketRes: Int,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val p = markerPath(outDir, bucket)
    HadoopIO.exists(p, conf) && {
      val m = HadoopIO.readString(p, conf)
      m.contains("\"complete\":true") &&
        m.contains("\"lineage\":\"" + lineage + "\"") &&
        // extract-and-compare, NOT substring: a contains of "bucket_res":1
        // would accept a marker recording 12 (prefix match) and skip every
        // bucket after a resolution change
        """"bucket_res":(\d+)""".r.findFirstMatchIn(m)
          .exists(_.group(1).toInt == bucketRes)
    }
  }

  /** Run `work` once per bucket of `tiled` (a DataFrame with a `tile`
    * column), checkpointing each. `work` receives the bucket's slice and
    * must return the DataFrame to persist.
    *
    * @param lineage opaque provenance string recorded in every marker
    *                (e.g. input snapshot id + code version); a staged input
    *                copy from a DIFFERENT lineage is discarded and re-staged
    * @param parallelism bucket jobs submitted concurrently (round-3 verdict
    *                item 5: strictly sequential buckets serialize the
    *                small-bucket TAIL on the driver — a cluster that fits
    *                several bucket jobs at once idles between them).
    *                Concurrent Spark jobs from one session are safe (the
    *                scheduler interleaves stages); each bucket still writes
    *                its own marker, so a crash mid-concurrent-run resumes
    *                exactly like the sequential case — completed buckets
    *                skip, in-flight ones re-run. On failure, no NEW buckets
    *                start, in-flight ones finish (and keep their markers),
    *                and the first failure (in bucket order) is rethrown.
    *                Default 1 (strict bucket order): concurrency is OPT-IN
    *                because it makes the `work` closure a concurrent API —
    *                callers whose closure touches shared driver state
    *                (session conf flips, counters) must pass >1 only once
    *                the closure is thread-safe. */
  def run(spark: SparkSession, tiled: DataFrame, outDir: String,
      work: DataFrame => DataFrame, bucketRes: Int = 2,
      lineage: String = "unspecified",
      failInjector: Long => Unit = _ => (),
      parallelism: Int = 1): Seq[BucketResult] = {
    val conf = spark.sessionState.newHadoopConf()
    val stagedDir = s"$outDir/staged_input"
    val lineageFile = s"$outDir/_staged_lineage.json"
    // staging validity covers BOTH lineage and bucketRes: the staged copy
    // is partitioned at a specific resolution, so a same-lineage run with a
    // different bucketRes must re-stage (reusing the old partitioning would
    // run work over old-resolution slices while stamping markers with the
    // new resolution)
    val stagedStamp = s"""{"lineage":"$lineage","bucket_res":$bucketRes}"""
    val stagedValid = HadoopIO.exists(s"$stagedDir/_SUCCESS", conf) &&
      HadoopIO.exists(lineageFile, conf) &&
      HadoopIO.readString(lineageFile, conf) == stagedStamp
    if (!stagedValid) {
      // lineage changed (or first run): everything downstream of the staging
      // is stale — drop old bucket outputs and markers so a bucket absent
      // from the NEW bucket list can't survive into readOutput
      val fs = HadoopIO.fileSystem(outDir, conf)
      val outPath = new org.apache.hadoop.fs.Path(outDir)
      if (fs.exists(outPath)) {
        fs.listStatus(outPath)
          .filter(s => s.getPath.getName.startsWith("bucket=") ||
            s.getPath.getName == "_ckpt")
          .foreach(s => fs.delete(s.getPath, true))
      }
      tiled.withColumn("_bucket", F.cell_parent(col("tile"), bucketRes))
        .write.mode("overwrite").partitionBy("_bucket").parquet(stagedDir)
      HadoopIO.writeString(lineageFile, stagedStamp, conf)
    }
    val staged = spark.read.parquet(stagedDir)
    // bucket list from the partition directory names — a filesystem listing,
    // not a data scan
    val buckets = HadoopIO.fileSystem(stagedDir, conf)
      .listStatus(new org.apache.hadoop.fs.Path(stagedDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_bucket="))
      .map(_.getPath.getName.stripPrefix("_bucket=").toLong)
      .sorted.toSeq

    def runBucket(b: Long): BucketResult =
      if (isDone(outDir, b, lineage, bucketRes, conf)) BucketResult(b, -1L, 0L, skipped = true)
      else {
        val t0 = System.nanoTime()
        failInjector(b) // test hook: simulate a crash mid-run
        val slice = staged.where(col("_bucket") === b).drop("_bucket")
        val obs = Observation(s"bucket_$b")
        work(slice).observe(obs, count(lit(1)).as("rows"))
          .write.mode("overwrite").parquet(s"$outDir/bucket=$b")
        val rows = obs.get("rows").asInstanceOf[Long]
        val wallMs = (System.nanoTime() - t0) / 1000000
        val marker =
          s"""{"bucket":$b,"complete":true,"rows":$rows,"wall_ms":$wallMs,
             |"lineage":"$lineage","bucket_res":$bucketRes}""".stripMargin
        HadoopIO.writeString(markerPath(outDir, b), marker, conf)
        BucketResult(b, rows, wallMs, skipped = false)
      }

    val results: Seq[BucketResult] =
      if (parallelism <= 1 || buckets.size <= 1) buckets.map(runBucket)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(parallelism, buckets.size))
        val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
        try {
          val futures = buckets.map(b => pool.submit(new java.util.concurrent.Callable[BucketResult] {
            def call(): BucketResult = {
              if (aborted.get) throw new java.util.concurrent.CancellationException(
                s"bucket $b not started: an earlier bucket failed")
              try runBucket(b)
              catch { case t: Throwable => aborted.set(true); throw t }
            }
          }))
          // await ALL in bucket order (in-flight work finishes and keeps its
          // markers), then rethrow the first real failure in bucket order
          val outcomes = futures.map(f =>
            try Right(f.get())
            catch { case e: java.util.concurrent.ExecutionException => Left(e.getCause) })
          outcomes.collectFirst {
            case Left(t) if !t.isInstanceOf[java.util.concurrent.CancellationException] => t
          }.foreach(throw _)
          outcomes.collectFirst { case Left(t) => t }.foreach(throw _) // all-cancelled edge
          outcomes.collect { case Right(r) => r }
        } finally pool.shutdown()
      }
    // aggregate metrics for the whole run
    val done = results.filterNot(_.skipped)
    val metrics =
      s"""{"buckets_total":${buckets.length},"buckets_run":${done.length},
         |"buckets_skipped":${results.count(_.skipped)},
         |"rows":${done.map(_.rows).sum},"wall_ms":${done.map(_.wallMs).sum},
         |"lineage":"$lineage"}""".stripMargin
    HadoopIO.writeString(s"$outDir/_pipeline_metrics.json", metrics, conf)
    results
  }

  /** Read back all bucket outputs as one DataFrame. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/bucket=*")
}
