package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The p1–p4 contract queries are `no_oracle` to the driver (DuckDB cannot
  * read .osm.pbf); their outputs self-certify instead — every row carries
  * an `ok` verdict computed in-query against the fixture generator's
  * ground truth (EntryFixtures.p*Truth). This suite asserts the verdicts
  * are all true and that the join added no rows (the driver's rows check
  * must stay stable). p7's equivalent gate is its own parity filter. */
class EntrySelfCertSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  for (q <- Seq("p1_pbf_counts", "p2_pbf_tag_filter", "p3_way_assembly", "p4_polygons",
      "m2_image_resize", "m5_audio_wav", "m6_video_avi")) {
    test(s"$q rows are self-certifying: every ok=true, no row lost to the truth join") {
      val df = SparkEntry.queries(q)(spark, sfDir).cache()
      try {
        val total = df.count()
        assert(total > 0, s"$q returned no rows")
        val notOk = df.where(!col("ok")).count()
        assert(notOk === 0, s"$q: $notOk rows failed their ground-truth verdict")
      } finally df.unpersist()
    }
  }

  test("the verdict machinery actually FIRES: dropped and fabricated rows surface as ok=false") {
    // the loop above only proves green-stays-green; this proves the
    // mechanism can fail — an engine that DROPS a row (truth-only after the
    // full join) or FABRICATES one (actual-only) must yield ok=false rows,
    // never silently shrink or pass
    import spark.implicits._
    val truth = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "expected")
    val dropped = Seq((1L, 10), (3L, 30)).toDF("id", "actual")         // engine lost id=2
    val fabricated = Seq((1L, 10), (2L, 20), (3L, 30), (9L, 90)).toDF("id", "actual")
    val wrong = Seq((1L, 10), (2L, 99), (3L, 30)).toDF("id", "actual") // wrong value

    val d = SparkEntry.selfCert(dropped, truth, Seq("id"), col("actual") === col("expected"))
    assert(d.count() === 3, "dropped row must still SURFACE via the full join")
    assert(d.where(!col("ok")).select("id").as[Long].collect().toSet === Set(2L))

    val f = SparkEntry.selfCert(fabricated, truth, Seq("id"), col("actual") === col("expected"))
    assert(f.count() === 4)
    assert(f.where(!col("ok")).select("id").as[Long].collect().toSet === Set(9L))

    val w = SparkEntry.selfCert(wrong, truth, Seq("id"), col("actual") === col("expected"))
    assert(w.where(!col("ok")).select("id").as[Long].collect().toSet === Set(2L))
  }
}
