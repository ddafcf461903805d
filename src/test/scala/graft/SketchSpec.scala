package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch/approximation surface (the statistics toolkit that replaces
  * exact operators at 100 TB): Bloom filter, count-min sketch, approximate
  * quantiles, HLL. Sketches trade exactness for fixed memory — the tests
  * assert their error contracts, not exact values.
  */
class SketchSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.01"
  private lazy val events = Tables.events(spark, sf).cache()

  test("bloom filter: no false negatives, bounded false positives") {
    val bf = events.stat.bloomFilter("user_id", 1000, 0.03)
    val present = events.select("user_id").distinct()
      .collect().map(_.getLong(0))
    assert(present.forall(bf.mightContain), "bloom filters must have no false negatives")
    val absent = (1000000L to 1001000L).count(bf.mightContain)
    assert(absent < 100, s"false positive rate too high: $absent/1000")
  }

  test("count-min sketch: estimates dominate true counts within epsilon") {
    val cms = events.stat.countMinSketch(col("event_type"), 0.01, 0.99, 42)
    val truth = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS must never underestimate ($k: $est < $n)")
      assert(est <= n + (0.01 * events.count()).toLong + 1, s"$k overestimate too large")
    }
  }

  test("approxQuantile brackets the exact percentiles") {
    val approx = events.stat.approxQuantile("value", Array(0.25, 0.5, 0.75), 0.01)
    val exact = events.selectExpr(
        "percentile(value, 0.25)", "percentile(value, 0.5)", "percentile(value, 0.75)")
      .first().toSeq.map(_.asInstanceOf[Double])
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("approx_count_distinct within rsd of exact") {
    val row = events.agg(
      approx_count_distinct(col("user_id"), 0.02).as("a"),
      countDistinct(col("user_id")).as("e")).first()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1, s"HLL $a vs exact $e")
  }
}
