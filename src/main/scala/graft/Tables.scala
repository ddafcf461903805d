package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md, FIXTURES.md).
  * One parquet file per table under `$sfDir/<name>.parquet`.
  *
  * Reference semantics: these tables stand in for the reference's sources —
  * the `events` table is the Kinesis-stream stand-in (ordered event records,
  * cf. /root/reference README: AWS Lambda stream processing), the TPC-H-ish
  * star schema is the DynamoDB-lookup/enrichment side.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS,ntz), which Spark 4.x refuses to
    * read natively (PARQUET_TYPE_ILLEGAL). Read it as long nanos via the
    * legacy conf (runtime-settable) and convert to a microsecond timestamp.
    * The conversion uses integer `div`, NOT double division: nanosecond
    * epochs (~1.7e18) exceed 2^53, so a round-trip through double would
    * corrupt low-order digits. Lossless on this data (no sub-µs components).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
