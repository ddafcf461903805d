package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing beyond the co-located join (SkewBucketSpec): aggregation on
  * the bucket key satisfies its required distribution straight from the
  * file layout (no pre-aggregation shuffle), and point-lookups prune to a
  * single bucket file. At 100 TB these turn a repeated full-table shuffle
  * into a one-time layout decision at ingest, and a full-table scan into
  * a 1-of-N file read.
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.collect { case s: ShuffleExchangeExec => s }.size

  private def withBucketedLineitem[A](body: String => A): A = {
    // unique dir AND table name per call: a fixed global name collides
    // under parallel test execution, and the temp dir must not outlive
    // the test
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket")
    val table = s"graft_lineitem_bkt_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.lineitem(spark, sf)
      .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/lineitem_bkt").saveAsTable(table)
    try body(table)
    finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("aggregation on the bucket key needs no pre-aggregation shuffle") {
    withBucketedLineitem { table =>
      val a = spark.table(table)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(shuffles(a) === 0,
        s"groupBy(bucket key) should satisfy its distribution from the layout:\n${a.queryExecution.sparkPlan}")
      val expected = Tables.lineitem(spark, sf)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(a.orderBy("l_orderkey").collect().toSeq ===
        expected.orderBy("l_orderkey").collect().toSeq)
    }
  }

  test("bucketed scan prunes to a single bucket on key equality") {
    withBucketedLineitem { table =>
      val one = spark.table(table).filter(col("l_orderkey") === 42)
      val scan = one.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      assert(scan.bucketedScan, "scan should be bucketed")
      assert(scan.metadata.get("SelectedBucketsCount").exists(_.contains("1 out of 8")),
        scan.metadata.toString)
    }
  }
}
