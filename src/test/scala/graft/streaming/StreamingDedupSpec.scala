package graft.streaming

import graft.SparkTestBase
import graft.text.Dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("streamed first-seen set equals batch exact-dedup distinct fingerprints") {
    val rows = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon"),
      (4L, "alpha beta gamma"), (5L, "zeta"), (6L, "delta epsilon"),
      (7L, null.asInstanceOf[String])) // null text must not kill the query
    val dir = s"$tmpDir/sdedup-in"
    docsDf(rows).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val out = StreamingDedup.firstSeen(spark.readStream.schema(schema).parquet(dir))
    val qname = s"sdedup_${System.nanoTime()}"
    out.writeStream.outputMode("append").format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val streamed = spark.table(qname).collect()
      .map(r => (r.getAs[String]("fingerprint"), r.getAs[Int]("n_tokens"))).toSet
    val batch = Dedup.exact(docsDf(rows).where(col("text").isNotNull))
      .where(!col("is_duplicate"))
      .join(docsDf(rows), "doc_id")
      .select(col("fingerprint"), size(split(col("text"), " ", -1)).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(streamed === batch)
    assert(streamed.size === 3) // one per distinct text, duplicates suppressed
  }

  test("state survives restart: fingerprints seen in run 1 stay suppressed in run 2") {
    val dir = s"$tmpDir/sdedup-restart-in"
    val outDir = s"$tmpDir/sdedup-restart-out"
    val ckpt = s"$tmpDir/sdedup-restart-ckpt"
    def run(): Unit = {
      val schema = spark.read.parquet(dir).schema
      StreamingDedup.firstSeen(spark.readStream.schema(schema).parquet(dir))
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // run 1: two distinct texts
    docsDf(Seq((1L, "one two"), (2L, "three"))).write.mode("overwrite").parquet(dir)
    run()
    val after1 = spark.read.parquet(outDir).collect().map(_.getAs[String]("fingerprint")).toSet
    assert(after1.size === 2)
    // run 2: a NEW file carrying one already-seen text and one new one —
    // the restored checkpoint state must suppress the repeat
    docsDf(Seq((3L, "one two"), (4L, "four five six")))
      .coalesce(1).write.mode("append").parquet(dir)
    run()
    val after2 = spark.read.parquet(outDir).collect().map(_.getAs[String]("fingerprint"))
    assert(after2.length === 3, "exactly one new emission in run 2")
    assert(after2.toSet.size === 3, "no fingerprint ever emitted twice")
    assert(after2.toSet.subsetOf(
      Dedup.exact(spark.read.parquet(dir)).select("fingerprint")
        .collect().map(_.getString(0)).toSet))
  }

  test("TTL variant bounds state: expired fingerprints re-emit, live ones stay suppressed") {
    import spark.implicits._
    val dir = s"$tmpDir/sdedup-ttl-in"
    val outDir = s"$tmpDir/sdedup-ttl-out"
    val ckpt = s"$tmpDir/sdedup-ttl-ckpt"
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    def feed(rows: Seq[(Long, String, java.sql.Timestamp)], first: Boolean): Unit = {
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode(if (first) "overwrite" else "append").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      StreamingDedup.firstSeenWithTTL(
        spark.readStream.schema(schema).parquet(dir), "ts", ttlMillis = 3600L * 1000)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def emitted(): Seq[String] =
      spark.read.parquet(outDir).collect().map(_.getAs[String]("fingerprint")).toSeq
    // run 1 (watermark → 0h): A and B emitted, TTL horizon = 1h
    feed(Seq((1L, "doc A", ts(0)), (2L, "doc B", ts(0)), (3L, "doc A", ts(0))), first = true)
    assert(emitted().length === 2)
    // run 2 (watermark 0h during the batch): A repeats within horizon →
    // suppressed; C is new → emitted; watermark advances to 3h afterwards
    feed(Seq((4L, "doc A", ts(3)), (5L, "doc C", ts(3))), first = false)
    assert(emitted().length === 3)
    // run 3: watermark (3h) is past A/B's timeout (0h+1h) — their keys get
    // the hasTimedOut call and are forgotten; D rides above the watermark
    // (an event AT the watermark is late and dropped) as the batch payload
    feed(Seq((6L, "doc D", ts(4))), first = false)
    assert(emitted().length === 4)
    // run 4: A returns AFTER expiry (and above the 4h watermark) → emitted
    // a second time
    feed(Seq((7L, "doc A", ts(5))), first = false)
    val all = emitted()
    assert(all.length === 5)
    assert(all.groupBy(identity).values.map(_.size).toSet === Set(1, 2),
      "exactly one fingerprint (doc A) emitted twice")
  }

  test("TTL variant: a post-expiry recurrence in the timeout's own trigger re-emits") {
    import spark.implicits._
    // Spark fires hasTimedOut only for keys with NO data in the trigger, so
    // a fingerprint recurring in the very batch where its timeout would
    // have fired reaches the function with stale state — suppressing it
    // (the old state.exists behavior) silently swallowed the post-expiry
    // occurrence, and the wm+1 re-arm then dropped the key having emitted
    // nothing. The expiry-vs-watermark check must treat it as a fresh
    // window. Also pins the deterministic anchor: two occurrences in one
    // batch anchor the window at the MINIMUM event time.
    val dir = s"$tmpDir/sdedup-ttl2-in"
    val outDir = s"$tmpDir/sdedup-ttl2-out"
    val ckpt = s"$tmpDir/sdedup-ttl2-ckpt"
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    def feed(rows: Seq[(Long, String, java.sql.Timestamp)], first: Boolean): Unit = {
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode(if (first) "overwrite" else "append").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      StreamingDedup.firstSeenWithTTL(
        spark.readStream.schema(schema).parquet(dir), "ts", ttlMillis = 3600L * 1000)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def counts(): Map[String, Int] =
      spark.read.parquet(outDir).collect().map(_.getAs[String]("fingerprint"))
        .groupBy(identity).view.mapValues(_.length).toMap
    // run 1: E twice in ONE batch (2h listed first) — anchored at min(0h),
    // expiry 1h; emitted once
    feed(Seq((1L, "doc E", ts(2)), (2L, "doc E", ts(0))), first = true)
    assert(counts().values.toSeq === Seq(1))
    // run 2: unrelated key advances the watermark to 3h (past E's 1h expiry)
    feed(Seq((3L, "doc X", ts(3))), first = false)
    assert(counts().values.sum === 2)
    // run 3: E recurs at 4h IN the trigger where its timeout would fire
    // (wm=3h > expiry=1h, but E has data so hasTimedOut never fires for it)
    feed(Seq((4L, "doc E", ts(4))), first = false)
    val c = counts()
    assert(c.values.sum === 3)
    assert(c.values.max === 2, s"post-expiry same-trigger recurrence swallowed: $c")
  }
}
