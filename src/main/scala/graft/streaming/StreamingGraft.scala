package graft.streaming

import graft.pipeline.GraftJob

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming graft: incremental tile maintenance over an image STREAM
  * joined against the static polygon index — the stream-shaped form of the
  * flagship job (north_star: a growing 10^12-image table whose new batches
  * must update tile stats without rescanning history).
  *
  * Shape: the batch graft job computes two aggregations and joins them —
  * not expressible as a single incremental streaming plan (two stateful
  * aggs feeding a join). The supported Spark idiom is `foreachBatch`:
  * each micro-batch runs the (already scale-disciplined) batch job over
  * the NEW images only and appends that batch's per-tile DELTAS; the
  * additive rollup (sum of deltas ≡ full recompute, proven in
  * PipelineSpec's incremental-maintenance test) folds them on read, or
  * periodically into a compacted snapshot.
  *
  * Exactly-once: deltas land in a `batch_id=<id>` partition written with
  * dynamic partition overwrite, so a retried micro-batch REPLACES its own
  * partition instead of double-counting — idempotent per batch id, the
  * standard foreachBatch sink contract. The distinct-poly sketch is
  * excluded (not additive), as in the batch incremental proof.
  */
object StreamingGraft {

  /** Start the incremental maintenance query (AvailableNow by default:
    * drain what exists, then stop — restart to pick up new files). */
  def run(imagesStream: DataFrame, polys: DataFrame, deltaDir: String,
      checkpointDir: String, z: Int = 10, res: Int = 12,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    imagesStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchDelta(batch, polys, deltaDir, batchId, z, res)
      }
      .trigger(trigger)
      .start()

  /** One micro-batch's delta write — exposed so a retry can be exercised
    * directly (same batchId → same partition replaced, totals unchanged). */
  def writeBatchDelta(batch: DataFrame, polys: DataFrame, deltaDir: String,
      batchId: Long, z: Int, res: Int): Unit =
    GraftJob.run(batch, polys, z = z, res = res)
      .drop("n_distinct_polys")
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(deltaDir)

  /** Current tile stats = additive fold of all batch deltas. An empty
    * source (no micro-batch ever fired, so no delta dir exists) is empty
    * stats, not a missing-path error. */
  def rollup(spark: SparkSession, deltaDir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    if (!graft.util.HadoopIO.exists(deltaDir, conf)) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("tile", LongType), StructField("tile_z", IntegerType),
          StructField("tile_x", IntegerType), StructField("tile_y", IntegerType),
          StructField("n_images", LongType), StructField("n_hits", LongType))))
    } else
      spark.read.parquet(deltaDir)
        .groupBy("tile", "tile_z", "tile_x", "tile_y")
        .agg(sum("n_images").as("n_images"), sum("n_hits").as("n_hits"))
  }
}
