package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the pipeline-assembly operators
  * (PipelineQueries) that the row-hash oracle can't express: shard
  * contiguity, chunk-count arithmetic vs a brute-force recount, and
  * reservoir stability under repartitioning.
  */
class PipelineSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.01"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_pack_sequences: shards tile each source's doc range contiguously") {
    val rows = q("q_pack_sequences")
      .select("source", "shard", "doc_lo", "doc_hi", "tok_total", "n_docs")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (source, shardRows) =>
      val ordered = shardRows.sortBy(_.getLong(1))
      // shard ids start at 0 and strictly increase (a doc longer than
      // 2048 tokens legitimately skips ids, so dense is NOT required)
      assert(ordered.head.getLong(1) == 0L, s"$source: first shard != 0")
      ordered.map(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a < b, s"$source: shard ids not increasing")
        case _ => ()
      }
      // consecutive shards hold disjoint, ordered doc ranges
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) < b.getLong(2),
            s"$source: shard ${a.getLong(1)} doc_hi >= shard ${b.getLong(1)} doc_lo")
        case _ => ()
      }
      // fixed-boundary arithmetic: a new shard opens only once the
      // running token prefix crosses its boundary, so the prefix through
      // every non-last shard s must be >= (s+1) * 2048
      var prefix = 0L
      ordered.init.foreach { r =>
        prefix += r.getLong(4)
        assert(prefix >= (r.getLong(1) + 1) * 2048,
          s"$source: prefix $prefix through shard ${r.getLong(1)} below boundary")
      }
    }
    // token conservation: shard totals sum to the corpus token count
    val packed = rows.map(_.getLong(4)).sum
    val corpus = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(packed == corpus, s"packed $packed tokens, corpus has $corpus")
  }

  test("q_doc_chunks: chunk counts match a brute-force per-doc recount") {
    val total = q("q_doc_chunks").select(sum("n_chunks")).head().getLong(0)
    val brute = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("tok")).collect()
      .map { r =>
        val tok = r.getInt(0)
        // walk windows of 64 with stride 48 until the doc is consumed
        var n = 0; var start = 0
        while (start == 0 || start + 16 < tok) { n += 1; start += 48 }
        n
      }.sum
    assert(total == brute, s"engine says $total chunks, brute force $brute")
  }

  test("q_contamination: counts are consistent and bucket-faithful") {
    val rows = q("q_contamination").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTest, nContam, nHits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nContam <= nTest, "contaminated docs cannot exceed test docs")
      assert((nContam == 0) == (nHits == 0), "hits and contaminated must agree on zero")
      assert(nHits >= nContam, "each contaminated doc carries >= 1 hit shingle")
    }
    // the test split is the >= 90 bucket of the same deterministic hash
    val expectTest = Tables.documents(spark, sf)
      .selectExpr(s"${operators.SamplingQueries.bucketExpr("doc_id")} AS b",
        "size(split(text, ' ')) AS tok")
      .filter(col("b") >= 90 && col("tok") >= 5).count()
    assert(rows.map(_.getLong(1)).sum == expectTest)
  }

  test("q_sample_reservoir: membership is repartition-stable and k-capped") {
    val base = q("q_sample_reservoir").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    base.foreach { case (lang, (nDocs, k, ids)) =>
      assert(k == math.min(5L, nDocs), s"$lang: k=$k with $nDocs docs")
      assert(ids.split(",").length.toLong == k, s"$lang: id list length != k")
    }
    // membership is a pure function of doc_id: a driver-side brute-force
    // rank over the same hash picks the identical members, independent of
    // Spark's window execution and input partitioning
    val brute = Tables.documents(spark, sf)
      .selectExpr("lang", "doc_id",
        s"${operators.Ql.md5PrefixLong("CAST(doc_id AS STRING)", 14)} AS h")
      .repartition(13) // different layout than the query saw
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (lang, rows) =>
        lang -> rows.sortBy(r => (r._3, r._2)).take(5).map(_._2).mkString(",")
      }
    brute.foreach { case (lang, ids) =>
      assert(base(lang)._3 == ids, s"$lang: engine picked ${base(lang)._3}, brute force $ids")
    }
  }
}
