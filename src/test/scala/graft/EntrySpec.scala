package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke gate over the driver contract: every SparkEntry query must run at
  * sf0.001 and produce rows; every oracleSql key must reference an existing
  * query. (Value-level parity vs DuckDB is the driver's job — replicated
  * locally by tools/check_oracle.py.)
  */
class EntrySpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  test("entry() produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
