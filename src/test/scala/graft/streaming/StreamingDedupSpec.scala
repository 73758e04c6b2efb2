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
      (4L, "alpha beta gamma"), (5L, "zeta"), (6L, "delta epsilon"))
    val dir = s"$tmpDir/sdedup-in"
    docsDf(rows).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val out = StreamingDedup.firstSeen(spark.readStream.schema(schema).parquet(dir))
    val qname = s"sdedup_${System.nanoTime()}"
    out.writeStream.outputMode("append").format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val streamed = spark.table(qname).collect()
      .map(r => (r.getAs[String]("fingerprint"), r.getAs[Int]("n_tokens"))).toSet
    val batch = Dedup.exact(docsDf(rows)).where(!col("is_duplicate"))
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
}
