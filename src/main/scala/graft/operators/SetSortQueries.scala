package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Sort / limit / set operations (SURVEY §2.F). */
object SetSortQueries extends QueryModule {

  /** F1/F3: global top-k — planned as TakeOrderedAndProject, not a full sort. */
  private val sortLimit = QueryDef(
    "q_sort_limit",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"),
          Ql.r(col("l_extendedprice")).as("price"))
        .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
    Some(s"""
      SELECT l_orderkey, l_linenumber, ${Ql.R("l_extendedprice")} AS price
      FROM lineitem
      ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100
    """))

  /** F4: union all of two tagged streams, then re-aggregated. */
  private val unionAll = QueryDef(
    "q_union_all",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
      val hi = e.filter(col("event_type") === "purchase" && col("value") > 400)
        .select(lit("hi_purchase").as("tag"), col("value"))
      val err = e.filter(col("event_type") === "error")
        .select(lit("error").as("tag"), col("value"))
      hi.unionByName(err)
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), Ql.r(sum(col("value"))).as("sum_value"))
        .orderBy("tag")
    },
    Some(s"""
      SELECT tag, count(*) AS n, ${Ql.R("sum(value)")} AS sum_value
      FROM (SELECT 'hi_purchase' AS tag, value FROM events
              WHERE event_type = 'purchase' AND value > 400
            UNION ALL
            SELECT 'error', value FROM events WHERE event_type = 'error')
      GROUP BY 1 ORDER BY 1
    """))

  /** F5: intersect / except, distinct and ALL variants, as tagged counts. */
  private val setOps = QueryDef(
    "q_set_ops",
    (spark, sfDir) => {
      val ck = Tables.customer(spark, sfDir).select(col("c_custkey"))
      val ek = Tables.events(spark, sfDir).select(col("user_id"))
      def tag(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(name).as("tag"), col("n"))
      tag("cust_with_events", ck.intersect(ek))
        .unionByName(tag("cust_without_events", ck.except(ek)))
        .unionByName(tag("event_rows_of_known_cust", ek.intersectAll(
          // intersectAll keeps min(multiplicity); customer keys are unique so
          // this counts distinct event users present in customer
          ck)))
        .unionByName(tag("event_rows_minus_one_per_cust", ek.exceptAll(ck)))
        .orderBy("tag")
    },
    Some("""
      SELECT tag, n FROM (
        SELECT 'cust_with_events' AS tag, count(*) AS n
          FROM (SELECT c_custkey FROM customer INTERSECT SELECT user_id FROM events)
        UNION ALL
        SELECT 'cust_without_events', count(*)
          FROM (SELECT c_custkey FROM customer EXCEPT SELECT user_id FROM events)
        UNION ALL
        SELECT 'event_rows_of_known_cust', count(*)
          FROM (SELECT user_id FROM events INTERSECT ALL SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'event_rows_minus_one_per_cust', count(*)
          FROM (SELECT user_id FROM events EXCEPT ALL SELECT c_custkey FROM customer))
      ORDER BY tag
    """))

  /** F6: distinct on a column subset. */
  private val distinctPairs = QueryDef(
    "q_distinct",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS INT)"))
        .select(col("event_type"), col("k"))
        .distinct()
        .orderBy(col("event_type"), col("k").asc_nulls_last),
    Some("""
      SELECT DISTINCT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events ORDER BY 1, 2 ASC NULLS LAST
    """))

  override def defs: Seq[QueryDef] = Seq(sortLimit, unionAll, setOps, distinctPairs)
}
