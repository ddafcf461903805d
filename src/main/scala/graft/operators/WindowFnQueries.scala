package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window functions (SURVEY §2.E): ranking, lag/lead, running
  * frames, top-k per group. Each window partitions by a key — at scale the
  * shuffle is on the partition key, never a global sort.
  */
object WindowFnQueries extends QueryModule {

  /** E1+E5: ranking trio + top-3 per group. */
  private val winRank = QueryDef(
    "q_win_rank",
    (spark, sfDir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("rk"), col("drk"),
          col("c_custkey"), Ql.r(col("c_acctbal")).as("acctbal"))
        .orderBy("c_nationkey", "rn")
    },
    Some(s"""
      SELECT c_nationkey,
             CAST(row_number() OVER w AS INTEGER) AS rn,
             CAST(rank() OVER w AS INTEGER) AS rk,
             CAST(dense_rank() OVER w AS INTEGER) AS drk,
             c_custkey, ${Ql.R("c_acctbal")} AS acctbal
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      QUALIFY rn <= 3
      ORDER BY c_nationkey, rn
    """))

  /** E2: lag — inter-event gap per user, aggregated. */
  private val winLag = QueryDef(
    "q_win_lag",
    (spark, sfDir) => {
      Tables.events(spark, sfDir)
        .withColumn("epoch", unix_timestamp(col("ts")))
        .withColumn("gap", col("epoch") - lag(col("epoch"), 1).over(
          Window.partitionBy("user_id").orderBy("epoch", "event_id")))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          Ql.r(avg(col("gap"))).as("avg_gap_sec"),
          max(col("gap")).as("max_gap_sec"))
        .orderBy("user_id")
    },
    Some(s"""
      SELECT user_id, count(*) AS n_events,
             ${Ql.R("avg(gap)")} AS avg_gap_sec, max(gap) AS max_gap_sec
      FROM (SELECT user_id,
                   epoch - lag(epoch) OVER (PARTITION BY user_id
                                            ORDER BY epoch, event_id) AS gap
            FROM (SELECT user_id, event_id,
                         epoch_ns(ts) // 1000000000 AS epoch FROM events))
      GROUP BY 1 ORDER BY 1
    """))

  /** E3+E4: running sum + first value over an ordered frame. */
  private val winRunning = QueryDef(
    "q_win_running",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .filter(col("o_custkey") < 100)
        .withColumn("running_total",
          Ql.r(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))))
        .withColumn("first_price", Ql.r(first(col("o_totalprice")).over(w)))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"), col("first_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""
      SELECT o_custkey, o_orderkey,
             ${Ql.R("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_total,
             ${Ql.R("first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)")} AS first_price
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey
    """))

  /** E2 lead + ntile/percent_rank coverage on a compact output. */
  private val winLeadNtile = QueryDef(
    "q_win_lead_ntile",
    (spark, sfDir) => {
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal"), col("s_suppkey"))
      Tables.supplier(spark, sfDir)
        .withColumn("next_bal", Ql.r(lead(col("s_acctbal"), 1).over(w)))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", Ql.r(percent_rank().over(w), 4))
        .select(col("s_suppkey"), col("s_nationkey"), col("next_bal"),
          col("quartile"), col("pct_rank"))
        .orderBy("s_suppkey")
    },
    Some(s"""
      SELECT s_suppkey, s_nationkey,
             ${Ql.R("lead(s_acctbal) OVER w")} AS next_bal,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             ${Ql.R("percent_rank() OVER w", 4)} AS pct_rank
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
      ORDER BY s_suppkey
    """))

  /** E3 (range frame): trailing-7-day order volume per customer — a
    * value-based (time) frame, not a row count; the batch twin of a
    * sliding event-time window.
    */
  private val winRange = QueryDef(
    "q_win_range_frame",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rangeBetween(-6, 0)
      Tables.orders(spark, sfDir)
        .filter(col("o_custkey") < 200)
        .withColumn("day", datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")))
        .withColumn("trailing_7d", Ql.r(sum(col("o_totalprice")).over(w)))
        .select(col("o_custkey"), col("o_orderkey"), col("day"), col("trailing_7d"))
        .orderBy("o_custkey", "day", "o_orderkey")
    },
    Some(s"""
      SELECT o_custkey, o_orderkey, day,
             ${Ql.R("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)")} AS trailing_7d
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day
            FROM orders WHERE o_custkey < 200)
      ORDER BY o_custkey, day, o_orderkey
    """))

  /** E1 tail: cume_dist + percent_rank side by side — the two normalized
    * rank forms (≤-fraction vs (rank−1)/(n−1)) over the same
    * per-event-type value ordering. Both divide exact integer ranks by
    * exact counts, so the doubles match cross-engine after the standard
    * rounding. The event_id tiebreak keeps the output ordering unique.
    */
  private val winCume = QueryDef(
    "q_win_cume",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables.events(spark, sfDir)
        .filter(col("user_id") < 10)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("cd", Ql.r(cume_dist().over(w), 6))
        .withColumn("pr", Ql.r(percent_rank().over(w), 6))
        .select(col("event_type"), col("event_id"),
          Ql.r(col("value"), 2).as("value_r"), col("cd"), col("pr"))
        .orderBy("event_type", "event_id")
    },
    Some(s"""
      SELECT event_type, event_id,
             ${Ql.R("value", 2)} AS value_r,
             ${Ql.R("cume_dist() OVER w", 6)} AS cd,
             ${Ql.R("percent_rank() OVER w", 6)} AS pr
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_type, event_id
    """))

  /** D7 tail: per-group box-plot statistics — quartiles, IQR, 1.5·IQR
    * whiskers, and the outlier count beyond them (Tukey's box plot,
    * public). Two passes: one percentile aggregation producing a
    * groups-sized threshold table, broadcast back for the outlier count
    * — the shape that holds when the fact table is 100 TB and the group
    * count is what fits in a dashboard.
    */
  private val boxplotStats = QueryDef(
    "q_boxplot_stats",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
      // quartiles are rounded to 6 dp BEFORE the fences are derived:
      // Spark's percentile and DuckDB's percentile_cont associate the
      // interpolation arithmetic differently (lower*(hi-pos)+higher*
      // (pos-lower) vs lower+(upper-lower)*frac), so raw q1/q3 can differ
      // by an ulp — and a value sitting exactly on a fence would then
      // flip n_outliers. From identical rounded doubles, the *1.5 fence
      // arithmetic is IEEE-deterministic in both engines.
      val q = e.groupBy("event_type")
        .agg(Ql.r(expr("percentile(value, 0.25)"), 6).as("q1"),
          Ql.r(expr("percentile(value, 0.5)"), 6).as("med"),
          Ql.r(expr("percentile(value, 0.75)"), 6).as("q3"))
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      e.join(broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          Ql.r(min(col("q1")), 4).as("q1"),
          Ql.r(min(col("med")), 4).as("median"),
          Ql.r(min(col("q3")), 4).as("q3"),
          Ql.r(min(col("hi") - col("lo")), 4).as("whisker_span"),
          sum((col("value") < col("lo") || col("value") > col("hi"))
            .cast("long")).as("n_outliers"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH q AS (
        SELECT event_type,
               ${Ql.R("percentile_cont(0.25) WITHIN GROUP (ORDER BY value)", 6)} AS q1,
               ${Ql.R("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)", 6)} AS med,
               ${Ql.R("percentile_cont(0.75) WITHIN GROUP (ORDER BY value)", 6)} AS q3
        FROM events GROUP BY 1),
      t AS (SELECT *, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
      SELECT e.event_type, count(*) AS n,
             ${Ql.R("min(q1)", 4)} AS q1,
             ${Ql.R("min(med)", 4)} AS median,
             ${Ql.R("min(q3)", 4)} AS q3,
             ${Ql.R("min(hi - lo)", 4)} AS whisker_span,
             CAST(sum(CASE WHEN e.value < lo OR e.value > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
      FROM events e JOIN t ON e.event_type = t.event_type
      GROUP BY 1 ORDER BY 1
    """))

  /** Period-over-period reporting: monthly revenue with MoM and YoY
    * growth via lag(1)/lag(12) over the ~80-row month series — the
    * executive dashboard twin of the running-agg frames above. The lag
    * window runs single-partition BY DESIGN: it sits on top of the
    * keyed monthly aggregation, so the windowed table is months-sized
    * (bounded by the calendar, not the data volume) no matter the scale
    * factor. Growth denominators are cent-rounded monthly sums —
    * always positive here, so the division is total.
    */
  private val momGrowth = QueryDef(
    "q_mom_growth",
    (spark, sfDir) => {
      val monthly = Tables.orders(spark, sfDir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(Ql.r(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev", lag(col("revenue"), 1).over(w))
        .withColumn("prev12", lag(col("revenue"), 12).over(w))
        .select(
          col("month"), col("revenue"), col("n_orders"),
          Ql.r((col("revenue") - col("prev")) * lit(100.0) / col("prev"), 4)
            .as("mom_pct"),
          Ql.r((col("revenue") - col("prev12")) * lit(100.0) / col("prev12"), 4)
            .as("yoy_pct"))
        .orderBy("month")
    },
    Some(s"""
      WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               ${Ql.R("sum(o_totalprice)", 2)} AS revenue,
               count(*) AS n_orders
        FROM orders GROUP BY 1),
      l AS (
        SELECT month, revenue, n_orders,
               lag(revenue, 1) OVER (ORDER BY month) AS prev,
               lag(revenue, 12) OVER (ORDER BY month) AS prev12
        FROM m)
      SELECT month, revenue, n_orders,
             ${Ql.R("(revenue - prev) * 100.0 / prev", 4)} AS mom_pct,
             ${Ql.R("(revenue - prev12) * 100.0 / prev12", 4)} AS yoy_pct
      FROM l ORDER BY month
    """))

  override def defs: Seq[QueryDef] = Seq(
    winRank, winLag, winRunning, winLeadNtile, winRange, winCume, boxplotStats,
    momGrowth)
}
