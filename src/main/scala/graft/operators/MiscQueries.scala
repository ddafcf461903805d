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

  /** Correlated EXISTS + NOT EXISTS chain (TPC-H Q21 shape adapted to the
    * driver schema): suppliers' lineitems in multi-supplier orders where
    * no other supplier shipped later. Exercises Catalyst's subquery
    * decorrelation — both correlated predicates rewrite to semi/anti
    * joins; the DataFrame-API joins elsewhere never take this SQL path.
    */
  private val sqlExistsChain = QueryDef(
    "q_sql_exists_chain",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_ec")
      Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders_ec")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_ec")
      spark.sql("""
        SELECT s_name, count(*) AS numwait
        FROM v_supplier_ec, v_lineitem_ec l1, v_orders_ec
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM v_lineitem_ec l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM v_lineitem_ec l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
      """)
    },
    Some("""
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20
    """))

  /** Correlated scalar aggregate subquery — orders priced far above their
    * own lineitems' average. Decorrelates to an aggregate + join.
    */
  private val sqlScalarSubq = QueryDef(
    "q_sql_scalar_subq",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_ss")
      Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders_ss")
      spark.sql(s"""
        SELECT o_orderpriority, count(*) AS n
        FROM v_orders_ss
        WHERE o_totalprice > 3 * (SELECT avg(l_extendedprice)
                                  FROM v_lineitem_ss
                                  WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_totalprice > 3 * (SELECT avg(l_extendedprice)
                                FROM lineitem
                                WHERE l_orderkey = o_orderkey)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  override def defs: Seq[QueryDef] = Seq(
    miscIds, miscStack, sqlInterface, sqlExistsChain, sqlScalarSubq)
}
