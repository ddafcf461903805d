package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY §2.C). The reference's only "join" is a per-record
  * DynamoDB GetItem enrichment (broadcast lookup); the engine exposes the
  * full relational join surface. Dimension tables (region/nation/customer/
  * supplier/part) are explicitly broadcast — at 100 TB the fact side never
  * shuffles for a dim join.
  */
object JoinQueries extends QueryModule {

  /** C1: broadcast lookup join — the DynamoDB per-record enrichment. */
  private val joinBroadcast = QueryDef(
    "q_join_broadcast",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      e.join(broadcast(c), e("user_id") === c("c_custkey"))
        .groupBy("event_type", "c_mktsegment")
        .agg(count(lit(1)).as("n"), Ql.r(sum(col("value"))).as("sum_value"))
        .orderBy("event_type", "c_mktsegment")
    },
    Some(s"""
      SELECT event_type, c_mktsegment, count(*) AS n,
             ${Ql.R("sum(value)")} AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** C2: equi inner join chain — revenue by nation (TPC-H flavored). */
  private val joinInner = QueryDef(
    "q_join_inner",
    (spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), Ql.r(sum(col("o_totalprice"))).as("revenue"))
        .orderBy("n_name")
    },
    Some(s"""
      SELECT n_name, count(*) AS n_orders, ${Ql.R("sum(o_totalprice)")} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1
    """))

  /** C3: left outer join — keep customers with zero orders. */
  private val joinLeft = QueryDef(
    "q_join_left",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
          countDistinct(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(when(col("o_orderkey").isNull, col("c_custkey"))).as("n_cust_no_orders"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
             count(o_orderkey) AS n_orders,
             count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_cust_no_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY 1
    """))

  /** C3: full outer join — both sides filtered so unmatched rows exist on
    * BOTH sides (negative-balance customers without urgent orders; urgent
    * orders from non-negative-balance customers), then bucketed by match
    * status. Proves null-extension on each side, not just the left.
    */
  private val joinFull = QueryDef(
    "q_join_full",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"), col("o_totalprice"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .withColumn("side",
          when(col("o_custkey").isNull, "left_only")
            .when(col("c_custkey").isNull, "right_only")
            .otherwise("matched"))
        .groupBy("side")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(coalesce(col("c_custkey"), col("o_custkey"))).as("n_keys"),
          Ql.r(sum(coalesce(col("o_totalprice"), lit(0.0)))).as("revenue"))
        .orderBy("side")
    },
    Some(s"""
      SELECT CASE WHEN o_custkey IS NULL THEN 'left_only'
                  WHEN c_custkey IS NULL THEN 'right_only'
                  ELSE 'matched' END AS side,
             count(*) AS n,
             count(DISTINCT coalesce(c_custkey, o_custkey)) AS n_keys,
             ${Ql.R("sum(coalesce(o_totalprice, 0))")} AS revenue
      FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal < 0) c
      FULL JOIN (SELECT o_custkey, o_totalprice FROM orders
                 WHERE o_orderpriority = '1-URGENT') o
        ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY 1
    """))

  /** C3: right outer join — orders kept even when the (filtered) customer
    * side has no match; null-extended customer columns grouped explicitly.
    */
  private val joinRight = QueryDef(
    "q_join_right",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.orders(spark, sfDir)
      c.join(o, c("c_custkey") === o("o_custkey"), "right")
        .groupBy(coalesce(col("c_mktsegment"), lit("(no match)")).as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          Ql.r(sum(col("o_totalprice"))).as("revenue"))
        .orderBy("segment")
    },
    Some(s"""
      SELECT coalesce(c_mktsegment, '(no match)') AS segment,
             count(*) AS n_orders,
             ${Ql.R("sum(o_totalprice)")} AS revenue
      FROM (SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_mktsegment = 'BUILDING') c
      RIGHT JOIN orders o ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY 1
    """))

  /** C4: left semi join — EXISTS-style filter (parts ever shipped at qty 50). */
  private val joinSemi = QueryDef(
    "q_join_semi",
    (spark, sfDir) => {
      val p = Tables.part(spark, sfDir)
      val l = Tables.lineitem(spark, sfDir).filter(col("l_quantity") === 50)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, count(*) AS n_parts
      FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_partkey = p_partkey AND l_quantity = 50)
      GROUP BY 1 ORDER BY 1
    """))

  /** C5: left anti join — NOT EXISTS (customers with no urgent orders). */
  private val joinAnti = QueryDef(
    "q_join_anti",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
      val n = Tables.nation(spark, sfDir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name, count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1
    """))

  /** C6: theta join — non-equi predicate on top of an equi key. */
  private val joinTheta = QueryDef(
    "q_join_theta",
    (spark, sfDir) => {
      val s = Tables.supplier(spark, sfDir).select(col("s_nationkey"), col("s_acctbal"))
      val c = Tables.customer(spark, sfDir).select(col("c_nationkey"), col("c_acctbal"))
      s.join(c, s("s_nationkey") === c("c_nationkey") && s("s_acctbal") > c("c_acctbal"))
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("nationkey")
    },
    Some("""
      SELECT s_nationkey AS nationkey, count(*) AS n_pairs
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      GROUP BY 1 ORDER BY 1
    """))

  /** C7: range/interval join — ship within 90 days of order date. */
  private val joinRange = QueryDef(
    "q_join_range",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      l.join(o, l("l_orderkey") === o("o_orderkey")
          && l("l_shipdate") >= o("o_orderdate")
          && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          Ql.r(avg(datediff(col("l_shipdate"), col("o_orderdate")))).as("avg_delay_days"))
        .orderBy("o_orderpriority")
    },
    Some(s"""
      SELECT o_orderpriority, count(*) AS n,
             ${Ql.R("avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))")} AS avg_delay_days
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      GROUP BY 1 ORDER BY 1
    """))

  /** C8: as-of join — latest order at-or-before each event's timestamp,
    * composed as range join + row_number()=1 (Spark has no native as-of).
    */
  private val joinAsof = QueryDef(
    "q_join_asof",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(spark, sfDir).filter(col("event_id") < 200)
      val o = Tables.orders(spark, sfDir)
      val w = Window.partitionBy("event_id")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      e.join(o, e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          Ql.r(col("o_totalprice")).as("price"))
        .orderBy("event_id")
    },
    Some(s"""
      SELECT event_id, user_id, o_orderkey, ${Ql.R("o_totalprice")} AS price
      FROM events JOIN orders ON user_id = o_custkey AND o_orderdate <= ts
      WHERE event_id < 200
      QUALIFY row_number() OVER (PARTITION BY event_id
                                 ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      ORDER BY event_id
    """))

  /** C2-at-scale: explicitly salted equi join for the pathological hot key
    * (one key ≫ a partition, beyond what AQE's skew split handles). The
    * left side is spread over 16 salt values, the right replicated per
    * salt, joined on (key, salt) — row-identical to the direct join, so
    * the oracle is simply the unsalted SQL. SkewBucketSpec proves the
    * identity; this registers the shape on the driver's gate.
    */
  private val joinSkewSalted = QueryDef(
    "q_join_skew_salted",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir).withColumnRenamed("user_id", "k")
      val c = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      Skew.saltedJoin(e, c, "k", buckets = 16)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Ql.r(sum(col("value"))).as("sum_value"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      SELECT c_mktsegment, count(*) AS n, ${Ql.R("sum(value)")} AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1 ORDER BY 1
    """))

  /** C11: cross join (cartesian). */
  private val joinCross = QueryDef(
    "q_join_cross",
    (spark, sfDir) => {
      val r = Tables.region(spark, sfDir).select(col("r_name"))
      val t = Tables.part(spark, sfDir).select(col("p_type")).distinct()
      r.crossJoin(t).orderBy("r_name", "p_type")
    },
    Some("""
      SELECT r_name, p_type
      FROM region, (SELECT DISTINCT p_type FROM part)
      ORDER BY r_name, p_type
    """))

  override def defs: Seq[QueryDef] = Seq(
    joinBroadcast, joinInner, joinLeft, joinFull, joinRight, joinSemi,
    joinAnti, joinTheta, joinRange, joinAsof, joinSkewSalted, joinCross)
}
