package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** G10 misc functions (SURVEY §2.G10). Nondeterministic-by-design ids
  * (monotonically_increasing_id, uuid, spark_partition_id,
  * input_file_name) can't hash-match an oracle value-for-value — so the
  * query emits their *invariants* as deterministic columns (row count,
  * uniqueness-as-boolean, presence flags) that an oracle CAN check:
  * the count comes from the table, the flags are exactly 1 whenever the
  * id functions behave per contract. Plus `stack` as the literal-table
  * generator.
  */
object MiscQueries extends QueryModule {

  private val miscIds = QueryDef(
    "q_misc_ids",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .withColumn("mono_id", monotonically_increasing_id())
        .withColumn("part_id", spark_partition_id())
        .withColumn("uid", expr("uuid()"))
        .withColumn("fname", input_file_name())
      e.agg(
        count(lit(1)).as("n"),
        (countDistinct(col("mono_id")) === count(lit(1))).cast("int").as("mono_ids_unique"),
        (countDistinct(col("uid")) === count(lit(1))).cast("int").as("uuids_unique"),
        (countDistinct(col("fname")) >= 1).cast("int").as("has_files"),
        (countDistinct(col("part_id")) >= 1).cast("int").as("has_partitions"))
    },
    Some("""
      SELECT count(*) AS n,
             1 AS mono_ids_unique,
             1 AS uuids_unique,
             1 AS has_files,
             1 AS has_partitions
      FROM events
    """))

  /** stack(): literal rows generator (the UNPIVOT shape). */
  private val miscStack = QueryDef(
    "q_misc_stack",
    (spark, sfDir) =>
      Tables.region(spark, sfDir)
        .select(col("r_name"), expr(
          "stack(2, 'upper', upper(r_name), 'lower', lower(r_name)) AS (variant, value)"))
        .orderBy("r_name", "variant"),
    Some("""
      SELECT r_name, variant, CASE variant WHEN 'upper' THEN upper(r_name)
                                           ELSE lower(r_name) END AS value
      FROM region, (SELECT unnest(['upper', 'lower']) AS variant)
      ORDER BY r_name, variant
    """))

  /** The SQL-string entry path: temp views + spark.sql — same Catalyst
    * plans as the DataFrame API (Spark's parser IS the engine's SQL
    * parser; SURVEY non-goal "no SQL parser of our own").
    */
  private val sqlInterface = QueryDef(
    "q_sql_interface",
    (spark, sfDir) => {
      Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
      Tables.customer(spark, sfDir).createOrReplaceTempView("v_customer")
      spark.sql(s"""
        SELECT c_mktsegment, o_orderstatus,
               count(*) AS n,
               round(sum(o_totalprice) + 1e-9, 2) AS revenue
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY 1, 2
        ORDER BY 1, 2
      """)
    },
    Some(s"""
      SELECT c_mktsegment, o_orderstatus, count(*) AS n,
             ${Ql.R("sum(o_totalprice)")} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2 ORDER BY 1, 2
    """))

  override def defs: Seq[QueryDef] = Seq(miscIds, miscStack, sqlInterface)
}
