package graft.osmpbf.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Osmosis replication-diff consumption (reference header_block.rs:33-71:
  * replication_sequence/timestamp/base_url model the minutely-diff stream;
  * the reference parses the fields but never applies a diff — this module
  * closes that loop, Spark-first).
  *
  * Model: a base snapshot plus a directory of sequential diff files
  * (`<seq>.osm.pbf`, zero-padded so lexical order = sequence order). Each
  * diff carries full element rows; osmosis create/modify/delete semantics
  * are expressed through `info.version` (monotone per element) and
  * `info.visible` (false = delete).
  *
  * Batch: [[applyDiffs]] merges snapshot ∪ diffs with latest-version-wins —
  * ONE shuffle on (kind, id), partial-agg-free window, no driver loops.
  * Streaming: [[diffStream]] tails the diff directory through the osmpbf
  * MICRO_BATCH_READ source; with a checkpoint dir the query resumes from
  * the last committed sequence after a crash (PipelineSpec-style resume is
  * asserted in ReplicationSpec).
  */
object OsmReplication {

  /** Merge a base snapshot with replication-diff rows. Both inputs use the
    * osmpbf unified schema; `diffs` must additionally carry a `seq` column
    * (LONG — diff sequence number; ties on version resolve to the highest
    * seq, base rows rank as seq = -1). Deleted elements (winning row has
    * info.visible = false) are dropped.
    */
  def applyDiffs(base: DataFrame, diffs: DataFrame): DataFrame = {
    val cols = base.columns.filter(_ != "seq")
    // a NULL seq marks a row from a file that is NOT a replication diff
    // (seqOfFile on a foreign name) — drop it rather than merge it: the
    // window below ranks by version FIRST, so a foreign file carrying
    // higher element versions (a stray newer extract, a backup) would
    // otherwise win the merge — including its visible=false rows, which
    // silently delete elements. diffStream's listing filter keeps such
    // files out of the stream; this guard covers BATCH callers reading an
    // unfiltered directory.
    val all = base.withColumn("seq", lit(-1L))
      .unionByName(diffs.where(col("seq").isNotNull)
        .select((cols.map(col) :+ col("seq")): _*))
    val w = Window.partitionBy(col("kind"), col("id"))
      .orderBy(coalesce(col("info.version"), lit(0)).desc, col("seq").desc)
    all
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && coalesce(col("info.visible"), lit(true)))
      .drop("_rn", "seq")
  }

  /** Extract the osmosis sequence number from a diff file path
    * (`.../<seq>.osm.pbf`). NULL — not an error — for any path whose FILE
    * NAME is not exactly `<digits>.osm.pbf`: the name must start at a path
    * separator (or string start), so `old-000000001.osm.pbf` is foreign
    * (NULL), not seq 1 — an unanchored match would hand foreign files a
    * real seq and walk them straight past [[applyDiffs]]'s null-seq drop.
    * The no-match branch also avoids the ANSI trap (regexp_extract yields
    * '' on no-match, and under ANSI — Spark 4's default — cast('' as long)
    * THROWS, so one stray file would crash the whole job); the digit run
    * is capped at 18 (any 18-digit value fits in a long) so a hostile
    * 20-digit name is foreign/NULL instead of an ANSI overflow error —
    * the cap costs nothing real, osmosis sequences are 9 digits. NULL-seq
    * rows are DROPPED by [[applyDiffs]], never merged. */
  def seqOfFile(fileCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    nullif(regexp_extract(fileCol, """(?:^|[/\\])(\d{1,18})\.osm\.pbf$""", 1), lit("")).cast("long")

  /** Streaming view of a replication directory: one row per element per
    * diff file, with its sequence number. Feed into `foreachBatch` with
    * [[applyDiffs]] (or any incremental sink) and a checkpointLocation for
    * crash/resume.
    *
    * Only files named `<seq>.osm.pbf` are visible to the stream
    * (`fileNamePattern`): the source's offset is the lexically-largest
    * path processed, so an admitted foreign file (`state.osm.pbf`, a
    * stray backup — any alphabetic name sorts above every zero-padded
    * diff) would be committed into the checkpoint as the offset and
    * silently wedge the stream above all future diffs; it would also
    * merge non-diff rows into [[applyDiffs]] state, where a higher
    * info.version wins regardless of seq. Filtering the listing keeps
    * foreign files out of offsets, partitions, and rows at once — seq is
    * then always non-null here (seqOfFile's NULL branch remains for
    * batch callers reading unfiltered directories). */
  def diffStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("osmpbf").option("withFile", "true")
      .option("fileNamePattern", """^\d{1,18}\.osm\.pbf$""").load(dir)
      .withColumn("seq", seqOfFile(col("_file")))
      .drop("_file")
}
