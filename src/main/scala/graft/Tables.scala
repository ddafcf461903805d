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
    *
    * Round 8's regenerated testdata writes `ts` as TIMESTAMP(MICROS,ntz)
    * instead, so the conversion is now schema-adaptive (see
    * [[normalizeEventTs]]) — both encodings land on the same session-UTC
    * TimestampType column every downstream query expects.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, sfDir, "events"))
  }

  /** Normalize an events frame's `ts` to session-UTC TimestampType across
    * the encodings the driver has shipped: long nanos (pre-r8, via the
    * nanosAsLong legacy conf), TIMESTAMP(MICROS,ntz) (r8+ — value-preserving
    * NTZ→LTZ cast under the UTC session timezone), or already-normalized
    * TimestampType (a restaged slice written by this engine).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
