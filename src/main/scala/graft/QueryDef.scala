package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are SQL-expressible) a DuckDB oracle twin for the driver's
  * hash-match correctness gate.
  *
  * Oracle determinism contract (FIXTURES.md): deterministic ORDER BY on a
  * unique key set on BOTH sides, identical column names/aliases, doubles
  * rounded identically, collected lists sorted, timestamps emitted as
  * formatted strings (cross-engine parquet timestamp logical types differ).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
