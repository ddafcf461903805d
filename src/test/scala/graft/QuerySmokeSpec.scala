package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and yields rows; every oracle key
  * points at a registered query. (Value-level correctness is the DuckDB
  * gate — scripts/check_correctness.py — this is the fast in-JVM smoke.)
  */
class QuerySmokeSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
