package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per suite (lazy, reused across suites in the
  * same JVM via getOrCreate).
  */
trait SparkFixture {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
