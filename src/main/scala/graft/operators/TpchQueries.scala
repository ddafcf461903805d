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

  override def defs: Seq[QueryDef] = Seq(
    q3Shape, q5Shape, q10Shape, q6Shape, q18Shape, q7Shape)
}
