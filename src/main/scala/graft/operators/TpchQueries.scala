package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** TPC-H-shaped multi-join reporting queries, adapted to the actual driver
  * schema (doubles not decimals, timestamps not dates, no comment columns —
  * FIXTURES.md). These exercise the join-order/broadcast/partial-agg
  * machinery the way a warehouse workload would.
  */
object TpchQueries extends QueryModule {

  /** Q7's nation pair — referenced by both the DataFrame plan and the
    * oracle SQL so they cannot drift apart.
    */
  private val q7Nations: (String, String) = ("NATION_18", "NATION_19")

  /** Q3 shape: shipping priority — revenue of orders from one segment,
    * ordered before a date with lineitems shipped after it; top 10.
    */
  private val q3Shape = QueryDef(
    "q_tpch_q3_shape",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(spark, sfDir).filter(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > lit("1998-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), Ql.tstr(col("o_orderdate")).as("orderdate"))
        .agg(Ql.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """))

  /** Q5 shape: local supplier volume — revenue where customer and supplier
    * share a nation, per nation of one region.
    */
  private val q5Shape = QueryDef(
    "q_tpch_q5_shape",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val l = Tables.lineitem(spark, sfDir)
      val s = Tables.supplier(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(s, l("l_suppkey") === s("s_suppkey")
          && c("c_nationkey") === s("s_nationkey"))
        .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(Ql.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },
    Some(s"""
      SELECT n_name,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
             count(*) AS n_items
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1 ORDER BY 1
    """))

  /** Q10 shape: returned-item reporting — revenue lost to returns per
    * customer, top 20.
    */
  private val q10Shape = QueryDef(
    "q_tpch_q10_shape",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val l = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
      val n = Tables.nation(spark, sfDir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(Ql.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_returned"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, n_name,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
             count(*) AS n_returned
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """))

  /** Q6 shape: revenue-change forecast — pure scan+filter+agg, the query
    * where predicate pushdown and vectorized scan dominate.
    */
  private val q6Shape = QueryDef(
    "q_tpch_q6_shape",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= lit("1997-01-01")
          && col("l_shipdate") < lit("1998-01-01")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(
          Ql.r(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
          count(lit(1)).as("n")),
    Some(s"""
      SELECT ${Ql.R("sum(l_extendedprice * l_discount)")} AS revenue,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """))

  /** Q18 shape: large-volume customers — aggregate + HAVING (the
    * post-aggregation filter surface), then joined back to dimensions.
    */
  private val q18Shape = QueryDef(
    "q_tpch_q18_shape",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      val bigOrders = l.groupBy("l_orderkey")
        .agg(Ql.r(sum(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > 150) // HAVING
      bigOrders
        .join(o, col("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          Ql.r(col("o_totalprice")).as("price"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    },
    Some(s"""
      SELECT c_custkey, c_name, o_orderkey, ${Ql.R("o_totalprice")} AS price, total_qty
      FROM (SELECT l_orderkey, ${Ql.R("sum(l_quantity)")} AS total_qty
            FROM lineitem GROUP BY 1
            HAVING ${Ql.R("sum(l_quantity)")} > 150) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      ORDER BY total_qty DESC, o_orderkey
      LIMIT 50
    """))

  /** Q7 shape: volume shipping between two nations — a 6-table join with a
    * disjunctive cross-side predicate. The scale move: each nation dim is
    * pre-filtered to the two names BEFORE its broadcast join (a 2-row
    * build side), so only the final 2-combination disjunction runs on
    * joined rows; the OR itself is not single-side-pushable.
    */
  private val q7Shape = QueryDef(
    "q_tpch_q7_shape",
    (spark, sfDir) => {
      // pair chosen to have traffic in BOTH directions even at sf0.001;
      // single source of truth — the disjunction and the oracle derive
      // from these two values (see n1Name/n2Name below)
      val (n1Name, n2Name) = TpchQueries.q7Nations
      val nations = Seq(n1Name, n2Name)
      val l = Tables.lineitem(spark, sfDir)
      val s = Tables.supplier(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      val n1 = Tables.nation(spark, sfDir).filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(spark, sfDir).filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      l.join(s, l("l_suppkey") === s("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === n1Name && col("cust_nation") === n2Name) ||
          (col("supp_nation") === n2Name && col("cust_nation") === n1Name))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(Ql.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""
      SELECT supp_nation, cust_nation, l_year, ${Ql.R("sum(volume)")} AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = '${q7Nations._1}' AND n2.n_name = '${q7Nations._2}')
           OR (n1.n_name = '${q7Nations._2}' AND n2.n_name = '${q7Nations._1}'))
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """))

  /** Q2 shape: minimum-cost supplier — a correlated scalar MIN subquery
    * over a shared CTE (lineitem stands in for partsupp: supply cost =
    * min unit price ever quoted by that supplier for that part). The
    * per-part regional minimum decorrelates to an aggregate + join; the
    * unit-price double division is bit-identical across engines, so the
    * `cost = (SELECT min ...)` equality is exact, no rounding hazard.
    */
  private val q2Shape = QueryDef(
    "q_tpch_q2_shape",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q2")
      Tables.part(spark, sfDir).createOrReplaceTempView("v_part_q2")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_q2")
      Tables.nation(spark, sfDir).createOrReplaceTempView("v_nation_q2")
      Tables.region(spark, sfDir).createOrReplaceTempView("v_region_q2")
      // The textbook form references `cost` twice — the main join AND a
      // correlated scalar MIN — and Catalyst inlines both, so the
      // lineitem pre-aggregation runs twice. But the scalar subquery's
      // domain (European suppliers of the same part) is EXACTLY the rows
      // the main join already produced for that part, so the per-part
      // minimum is a window over the single joined frame: one lineitem
      // aggregation, one partkey-partitioned window (already co-
      // partitioned with the join), zero recompute — the shape that
      // survives a 100 TB lineitem. The DuckDB oracle keeps the
      // correlated formulation, so the rewrite's equivalence is
      // hash-checked cross-engine every round.
      spark.sql("""
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS supply_cost
          FROM v_lineitem_q2 GROUP BY 1, 2
        ), euro AS (
          SELECT p_partkey, p_type, p_size, s_name, n_name, s_acctbal,
                 supply_cost,
                 min(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
          FROM v_part_q2
            JOIN cost ON l_partkey = p_partkey
            JOIN v_supplier_q2 ON l_suppkey = s_suppkey
            JOIN v_nation_q2 ON s_nationkey = n_nationkey
            JOIN v_region_q2 ON n_regionkey = r_regionkey
          WHERE p_size <= 10 AND r_name = 'EUROPE'
        )
        SELECT p_partkey, p_type, p_size, s_name, n_name,
               round(s_acctbal + 1e-9, 2) AS acctbal,
               round(supply_cost + 1e-9, 4) AS cost
        FROM euro
        WHERE supply_cost = min_cost
        ORDER BY acctbal DESC, n_name, s_name, p_partkey
        LIMIT 20
      """)
    },
    Some("""
      WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem GROUP BY 1, 2
      )
      SELECT p_partkey, p_type, p_size, s_name, n_name,
             round(s_acctbal + 1e-9, 2) AS acctbal,
             round(supply_cost + 1e-9, 4) AS cost
      FROM part
        JOIN cost ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_size <= 10 AND r_name = 'EUROPE'
        AND supply_cost = (
          SELECT min(c2.supply_cost)
          FROM cost c2
            JOIN supplier s2 ON c2.l_suppkey = s2.s_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY acctbal DESC, n_name, s_name, p_partkey
      LIMIT 20
    """))

  /** Q14 shape: promo revenue share — conditional aggregation over a
    * fact-dim join, one output row (the ratio-of-sums report).
    */
  private val q14Shape = QueryDef(
    "q_tpch_q14_shape",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= lit("1997-09-01")
          && col("l_shipdate") < lit("1997-10-01"))
      val p = Tables.part(spark, sfDir)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          Ql.r(lit(100) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
            / sum(rev), 3).as("promo_pct"),
          Ql.r(sum(rev)).as("total_rev"),
          count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT ${Ql.R("100 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount))", 3)} AS promo_pct,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS total_rev,
             count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """))

  /** Q16 shape: supplier diversity per part attribute — count(DISTINCT)
    * after a NOT IN subquery. NOT IN plans as a null-aware anti join, a
    * different physical path from the DataFrame-API left_anti elsewhere.
    */
  private val q16Shape = QueryDef(
    "q_tpch_q16_shape",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q16")
      Tables.part(spark, sfDir).createOrReplaceTempView("v_part_q16")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_q16")
      spark.sql("""
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM v_part_q16 JOIN v_lineitem_q16 ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM v_supplier_q16 WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 40
      """)
    },
    Some("""
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#3'
        AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      LIMIT 40
    """))

  /** Q4 shape: order-priority checking — a correlated EXISTS whose
    * predicate references BOTH sides (l_shipdate > o_orderdate + 60 days;
    * the schema has no l_commitdate/l_receiptdate, so "late" is
    * ship-lag against the order date). Catalyst decorrelates this to a
    * left-semi join with a non-equi conjunct.
    */
  private val q4Shape = QueryDef(
    "q_tpch_q4_shape",
    (spark, sfDir) => {
      Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders_q4")
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q4")
      spark.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders_q4
        WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
          AND EXISTS (
            SELECT 1 FROM v_lineitem_q4
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY 1
      """)
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY 1 ORDER BY 1
    """))

  /** Q13 shape: customer order-count distribution — a left outer join with
    * a compound (key + residual filter) condition, then aggregation OVER an
    * aggregate (count the counts). count(o_orderkey) counts matches only,
    * so no-order customers land in the c_count=0 bucket instead of
    * vanishing — the part an inner join would get wrong.
    */
  private val q13Shape = QueryDef(
    "q_tpch_q13_shape",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      c.join(o, c("c_custkey") === o("o_custkey")
          && o("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY 1)
      GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """))

  /** Q17 shape: small-quantity-order revenue — a correlated scalar AVG
    * subquery per part (quantity below 20% of that part's average).
    * Safe to oracle exactly: l_quantity is integral (1..50, verified), so
    * sum-of-doubles is exact at any partial-sum order and the avg is
    * bit-identical across engines — the threshold cannot wobble.
    */
  private val q17Shape = QueryDef(
    "q_tpch_q17_shape",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q17")
      Tables.part(spark, sfDir).createOrReplaceTempView("v_part_q17")
      spark.sql(s"""
        SELECT round(sum(l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly,
               count(*) AS n
        FROM v_lineitem_q17 JOIN v_part_q17 ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1' AND p_size < 15
          AND l_quantity < 0.2 * (
            SELECT avg(l_quantity) FROM v_lineitem_q17 l2
            WHERE l2.l_partkey = p_partkey)
      """)
    },
    Some(s"""
      SELECT ${Ql.R("sum(l_extendedprice) / 7.0")} AS avg_yearly,
             count(*) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1' AND p_size < 15
        AND l_quantity < 0.2 * (
          SELECT avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
    """))

  /** Q21 shape: suppliers who kept orders waiting — the EXISTS + NOT
    * EXISTS pair over the SAME fact table with different correlated
    * predicates (another supplier contributed to the order; no OTHER
    * supplier was late on it), i.e. one semi and one null-safe anti join
    * after decorrelation. "Late" = shipped >30 days after the order date
    * (no commit/receipt dates in this schema).
    */
  private val q21Shape = QueryDef(
    "q_tpch_q21_shape",
    (spark, sfDir) => {
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_q21")
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q21")
      Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders_q21")
      Tables.nation(spark, sfDir).createOrReplaceTempView("v_nation_q21")
      spark.sql("""
        SELECT n_name, s_name, count(*) AS numwait
        FROM v_supplier_q21
          JOIN v_lineitem_q21 l1 ON s_suppkey = l1.l_suppkey
          JOIN v_orders_q21 ON o_orderkey = l1.l_orderkey
          JOIN v_nation_q21 ON n_nationkey = s_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          AND EXISTS (
            SELECT 1 FROM v_lineitem_q21 l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM v_lineitem_q21 l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY 1, 2
        ORDER BY numwait DESC, n_name, s_name
        LIMIT 25
      """)
    },
    Some("""
      SELECT n_name, s_name, count(*) AS numwait
      FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON n_nationkey = s_nationkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY 1, 2
      ORDER BY numwait DESC, n_name, s_name
      LIMIT 25
    """))

  /** Q22 shape: dormant high-balance customers — an uncorrelated scalar
    * subquery (global avg threshold) plus a correlated NOT EXISTS against
    * orders ("no order since 2000"). The country code is the last c_name
    * digit (the schema has no phone column). The threshold is rounded to
    * cents then offset to mid-cent (+0.005): acctbals are exactly
    * 2-decimal (verified), so no row can sit within 4.9e-3 of the
    * threshold and the sub-1e-9 cross-engine avg wobble cannot flip a
    * comparison.
    */
  private val q22Shape = QueryDef(
    "q_tpch_q22_shape",
    (spark, sfDir) => {
      Tables.customer(spark, sfDir).createOrReplaceTempView("v_customer_q22")
      Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders_q22")
      spark.sql(s"""
        WITH pool AS (
          SELECT right(c_name, 1) AS cntrycode, c_custkey, c_acctbal
          FROM v_customer_q22
          WHERE right(c_name, 1) IN ('1', '2', '3', '5', '7', '8')),
        thr AS (
          SELECT round(avg(c_acctbal) + 1e-9, 2) + 0.005 AS t
          FROM pool WHERE c_acctbal > 0.0)
        SELECT cntrycode, count(*) AS numcust,
               round(sum(c_acctbal) + 1e-9, 2) AS totacctbal
        FROM pool
        WHERE c_acctbal > (SELECT t FROM thr)
          AND NOT EXISTS (
            SELECT 1 FROM v_orders_q22
            WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
        GROUP BY 1 ORDER BY 1
      """)
    },
    Some(s"""
      WITH pool AS (
        SELECT right(c_name, 1) AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE right(c_name, 1) IN ('1', '2', '3', '5', '7', '8')),
      thr AS (
        SELECT round(avg(c_acctbal) + 1e-9, 2) + 0.005 AS t
        FROM pool WHERE c_acctbal > 0.0)
      SELECT cntrycode, count(*) AS numcust,
             ${Ql.R("sum(c_acctbal)")} AS totacctbal
      FROM pool
      WHERE c_acctbal > (SELECT t FROM thr)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY 1 ORDER BY 1
    """))

  /** Q11 shape: important-stock identification — a grouped CTE filtered
    * against a global scalar derived from its own aggregate (parts worth
    * more than 2× the mean part value; mean, not a fixed total fraction,
    * so selectivity is scale-free — a total-fraction cut goes degenerate
    * as the part count grows). Both sides of the comparison are
    * cent-rounded and the threshold sits mid-cent (+0.005), so the
    * sub-1e-9 partial-sum wobble cannot flip a row (same contract as
    * q_tpch_q22_shape).
    */
  private val q11Shape = QueryDef(
    "q_tpch_q11_shape",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q11")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_q11")
      spark.sql("""
        WITH ps AS (
          SELECT l_partkey, round(sum(l_extendedprice * l_quantity) + 1e-9, 2) AS val
          FROM v_lineitem_q11 JOIN v_supplier_q11 ON l_suppkey = s_suppkey
          WHERE s_nationkey < 5
          GROUP BY l_partkey)
        SELECT l_partkey, val FROM ps
        WHERE val > (SELECT round(2.0 * avg(val) + 1e-9, 2) + 0.005 FROM ps)
        ORDER BY val DESC, l_partkey
      """)
    },
    Some(s"""
      WITH ps AS (
        SELECT l_partkey, ${Ql.R("sum(l_extendedprice * l_quantity)")} AS val
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey < 5
        GROUP BY l_partkey)
      SELECT l_partkey, val FROM ps
      WHERE val > (SELECT ${Ql.R("2.0 * avg(val)")} + 0.005 FROM ps)
      ORDER BY val DESC, l_partkey
    """))

  /** Q15 shape: top supplier — revenue CTE referenced twice (once as the
    * rows, once under an uncorrelated MAX), equality on the cent-rounded
    * revenue. Catalyst plans the reused CTE once per reference; the
    * rounding makes the max-equality deterministic across engines.
    */
  private val q15Shape = QueryDef(
    "q_tpch_q15_shape",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q15")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_q15")
      spark.sql("""
        WITH rev AS (
          SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS total_rev
          FROM v_lineitem_q15
          WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM v_supplier_q15 JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s_suppkey
      """)
    },
    Some(s"""
      WITH rev AS (
        SELECT l_suppkey, ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev
      FROM supplier JOIN rev ON s_suppkey = l_suppkey
      WHERE total_rev = (SELECT max(total_rev) FROM rev)
      ORDER BY s_suppkey
    """))

  /** Q19 shape: discounted-revenue over an OR-of-ANDs mixing both join
    * sides — the disjunction can't push to either scan alone, but its
    * single-side conjuncts can and do (brand/size to part, quantity to
    * lineitem): the CNF-extraction pushdown surface.
    */
  private val q19Shape = QueryDef(
    "q_tpch_q19_shape",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
      val p = Tables.part(spark, sfDir)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)
            && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(5, 20)
            && col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 30)
            && col("l_quantity").between(20, 40)))
        .agg(Ql.r(sum(rev)).as("revenue"), count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
             count(*) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 40)
    """))

  /** Q20 shape: excess-stock suppliers — IN over a grouped-HAVING subquery
    * whose threshold is itself a scalar subquery over the same CTE (1.1 ×
    * the mean per-supplier quantity; quantities are integral so the mean
    * is exact and the comparison cannot wobble). Plans as agg → filter →
    * semi join.
    */
  private val q20Shape = QueryDef(
    "q_tpch_q20_shape",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem_q20")
      Tables.part(spark, sfDir).createOrReplaceTempView("v_part_q20")
      Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier_q20")
      spark.sql("""
        WITH sq AS (
          SELECT l_suppkey, sum(l_quantity) AS q
          FROM v_lineitem_q20 JOIN v_part_q20 ON l_partkey = p_partkey
          WHERE p_size < 10
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name
        FROM v_supplier_q20
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM sq WHERE q > (SELECT 1.1 * avg(q) FROM sq))
        ORDER BY s_suppkey
      """)
    },
    Some("""
      WITH sq AS (
        SELECT l_suppkey, sum(l_quantity) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size < 10
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM sq WHERE q > (SELECT 1.1 * avg(q) FROM sq))
      ORDER BY s_suppkey
    """))

  /** Q8 shape: national market share — within AMERICA customers' PROMO-part
    * consumption, the revenue share supplied by NATION_5, per order year.
    * Two independent roles for the nation dim (customer's region membership
    * vs supplier's identity) force distinct broadcast instances of the same
    * table; the share is a ratio of conditional sums per group.
    */
  private val q8Shape = QueryDef(
    "q_tpch_q8_shape",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      val p = Tables.part(spark, sfDir).filter(col("p_type") === "PROMO")
      val s = Tables.supplier(spark, sfDir)
      val nCust = Tables.nation(spark, sfDir).select(
        col("n_nationkey").as("cn_nationkey"), col("n_regionkey").as("cn_regionkey"))
      val nSupp = Tables.nation(spark, sfDir).select(
        col("n_nationkey").as("sn_nationkey"), col("n_name").as("supp_nation"))
      val r = Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(nCust), c("c_nationkey") === col("cn_nationkey"))
        .join(broadcast(r), col("cn_regionkey") === r("r_regionkey"))
        .join(s, l("l_suppkey") === s("s_suppkey"))
        .join(broadcast(nSupp), s("s_nationkey") === col("sn_nationkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          Ql.r(sum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0.0)))
            / sum(rev), 4).as("mkt_share"),
          Ql.r(sum(rev)).as("total_rev"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    },
    Some(s"""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             ${Ql.R("sum(CASE WHEN n2.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount))", 4)} AS mkt_share,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS total_rev,
             count(*) AS n_items
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
      GROUP BY 1 ORDER BY 1
    """))

  /** Q9 shape: product-type profit — revenue minus a cost model
    * (0.6 × retail price × quantity stands in for ps_supplycost; the
    * schema has no partsupp table, FIXTURES.md), per supplier nation per
    * order year. The classic wide fact-to-every-dim star join.
    */
  private val q9Shape = QueryDef(
    "q_tpch_q9_shape",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val p = Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY")
      val s = Tables.supplier(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.6) * col("p_retailprice") * col("l_quantity")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(s, l("l_suppkey") === s("s_suppkey"))
        .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(Ql.r(sum(profit)).as("profit"), count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(s"""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity)")} AS profit,
             count(*) AS n_items
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
      WHERE p_type = 'ECONOMY'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """))

  /** Q12 shape: shipping-priority counts — CASE-sum tallies of urgent vs
    * other orders over a join with an interval lateness predicate
    * (l_shipdate ≥ o_orderdate + 60 days stands in for the commit/receipt
    * comparison; l_linestatus stands in for l_shipmode — FIXTURES.md has
    * neither column).
    */
  private val q12Shape = QueryDef(
    "q_tpch_q12_shape",
    (spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= lit("1998-01-01")
          && col("l_shipdate") < lit("1999-01-01"))
      val o = Tables.orders(spark, sfDir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] = Seq(
    q3Shape, q5Shape, q10Shape, q6Shape, q18Shape, q7Shape,
    q2Shape, q14Shape, q16Shape,
    q4Shape, q13Shape, q17Shape, q21Shape, q22Shape,
    q11Shape, q15Shape, q19Shape, q20Shape,
    q8Shape, q9Shape, q12Shape)
}
