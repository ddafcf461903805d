package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-pipeline sampling operators. Sampling is implementation-defined
  * (no cross-engine oracle possible) — the contract is determinism under a
  * seed plus statistical/partition invariants.
  */
class SamplingSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.01"

  test("sample(fraction, seed) is deterministic and near the target rate") {
    val e = Tables.events(spark, sf)
    val a = e.sample(0.1, 42).select("event_id").collect().map(_.getLong(0)).toSet
    val b = e.sample(0.1, 42).select("event_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must give the same sample")
    val n = e.count().toDouble
    assert(math.abs(a.size / n - 0.1) < 0.02, s"got rate ${a.size / n}")
    assert(e.sample(0.1, 7).select("event_id").collect().map(_.getLong(0)).toSet != a,
      "different seed should give a different sample")
  }

  test("randomSplit partitions the data into disjoint covering train/test") {
    val e = Tables.events(spark, sf).select("event_id").cache()
    val Array(train, test) = e.randomSplit(Array(0.8, 0.2), seed = 42)
    val tr = train.collect().map(_.getLong(0)).toSet
    val te = test.collect().map(_.getLong(0)).toSet
    assert((tr & te).isEmpty, "splits must be disjoint")
    assert(tr.size + te.size == e.count(), "splits must cover the input")
    assert(math.abs(tr.size / e.count().toDouble - 0.8) < 0.02)
  }

  test("hash-bucket split membership is invariant under repartitioning") {
    // the q_train_split claim: bucket = f(event_id) alone, so the same
    // rows land in the same split no matter how the data is partitioned
    // (rerun, backfill, different cluster size). df.sample, by contrast,
    // is partition-layout-dependent.
    val bucket = graft.operators.SamplingQueries.bucketExpr("event_id")
    val e = Tables.events(spark, sf)
    def membership(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.selectExpr("event_id", s"$bucket AS b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = membership(e)
    assert(membership(e.repartition(7)) == base)
    assert(membership(e.repartition(1)) == base)
    val rate = base.values.count(_ < 10).toDouble / base.size
    assert(math.abs(rate - 0.1) < 0.02, s"bucket<10 rate was $rate")
  }

  test("sampleBy stratifies per key with per-key fractions") {
    val e = Tables.events(spark, sf)
    val fractions = Map("click" -> 0.5, "view" -> 0.1, "error" -> 0.0,
      "purchase" -> 1.0, "signup" -> 0.2)
    val got = e.stat.sampleBy("event_type", fractions, 42L)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = e.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("error"), "0-fraction stratum must be empty")
    assert(got("purchase") == full("purchase"), "1.0-fraction stratum keeps all rows")
    assert(math.abs(got("click").toDouble / full("click") - 0.5) < 0.1)
  }
}
