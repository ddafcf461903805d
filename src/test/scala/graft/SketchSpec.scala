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

  test("relational CMS: merged sketch = direct sketch; estimate dominates every key") {
    // the oracle in q_cms_heavy proves cross-engine equality for the
    // candidate set; this asserts the two SKETCH properties for ALL keys —
    // linearity (daily merge == direct build, counter by counter) and the
    // one-sided error (est >= exact for every user, not just user_id%10)
    val w = 512
    val posOf = operators.Ql.md5PrefixLong(
      "concat(cast(r AS STRING), ':', cast(user_id AS STRING))", 14)
    val e = events.select(to_date(col("ts")).as("day"), col("user_id"))
    val rows = e.select(col("day"), col("user_id"),
        explode(expr("sequence(0, 3)")).as("r"))
      .select(col("day"), col("user_id"), col("r"), (expr(posOf) % w).as("p"))
    val merged = rows.groupBy("day", "r", "p").agg(count(lit(1)).as("c"))
      .groupBy("r", "p").agg(sum(col("c")).as("c"))
    val direct = rows.groupBy("r", "p").agg(count(lit(1)).as("c"))
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dd = direct.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == dd, "CMS linearity: merging daily sketches must equal the direct build")
    val exact = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    val est = rows.select("user_id", "r", "p").distinct()
      .join(merged, Seq("r", "p"))
      .groupBy("user_id").agg(min(col("c")).as("est"))
    val bad = exact.join(est, "user_id")
      .filter(col("est") < col("n")).count()
    assert(bad == 0L, "CMS must never underestimate any key")
  }

  test("relational Bloom decontamination: zero false negatives, bounded FP rate") {
    val out = SparkEntry.queries("q_bloom_decontam")(spark, sf)
      .agg(min(col("no_false_neg")).as("nfn"),
        sum(col("n_bloom_hit") - col("n_exact_hit")).as("fp"),
        sum(col("n_grams")).as("n")).first()
    assert(out.getAs[Int]("nfn") == 1, "a train gram slipped past the bitmap")
    val fpRate = out.getAs[Long]("fp").toDouble / out.getAs[Long]("n")
    // k=3, m=2^22: even sf0.1's ~800k positions fill only ~17% -> FPR ~ 0.5%
    assert(fpRate < 0.1, s"false-positive rate $fpRate above the m/k design point")
  }

  test("approx_count_distinct within rsd of exact") {
    val row = events.agg(
      approx_count_distinct(col("user_id"), 0.02).as("a"),
      countDistinct(col("user_id")).as("e")).first()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1, s"HLL $a vs exact $e")
  }
}
