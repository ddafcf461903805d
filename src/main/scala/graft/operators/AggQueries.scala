package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2.D) — the reference's keyed DynamoDB
  * counters generalized to the full aggregate family. All aggregations are
  * two-phase (partial map-side combine, final after shuffle) automatically
  * via HashAggregateExec — the property that makes them scale.
  */
object AggQueries extends QueryModule {

  /** D1/D2: pricing summary report — TPC-H Q1 shaped over the actual cols. */
  private val pricingSummary = QueryDef(
    "q_agg_pricing_summary",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("2000-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Ql.r(sum(col("l_quantity"))).as("sum_qty"),
          Ql.r(sum(col("l_extendedprice"))).as("sum_base_price"),
          Ql.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          Ql.r(avg(col("l_quantity"))).as("avg_qty"),
          Ql.r(avg(col("l_extendedprice"))).as("avg_price"),
          Ql.r(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${Ql.R("sum(l_quantity)")} AS sum_qty,
             ${Ql.R("sum(l_extendedprice)")} AS sum_base_price,
             ${Ql.R("sum(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
             ${Ql.R("avg(l_quantity)")} AS avg_qty,
             ${Ql.R("avg(l_extendedprice)")} AS avg_price,
             ${Ql.R("avg(l_discount)", 4)} AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** D3/D9: exact distinct aggregates. */
  private val aggDistinct = QueryDef(
    "q_agg_distinct",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS INT)"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("k")).as("n_ks"),
          sum_distinct(col("k").cast("long")).as("sum_distinct_k"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, count(*) AS n,
             count(DISTINCT user_id) AS n_users,
             count(DISTINCT TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS n_ks,
             CAST(sum(DISTINCT TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_distinct_k
      FROM events GROUP BY 1 ORDER BY 1
    """))

  /** D4: approx distinct (HLL) + approx percentile. The raw estimates have
    * no SQL-exact oracle (engine-specific sketches), so the query emits the
    * exact values plus the *error contract* as deterministic booleans: HLL
    * at rsd=0.01 within 5% of exact, approx_percentile within the observed
    * value range. The oracle computes the exact columns and asserts the
    * contract flags are 1 — a real cross-engine check of both families.
    * Raw-estimate accuracy is additionally spec-checked in SketchSpec.
    */
  private val aggApprox = QueryDef(
    "q_agg_approx",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          Ql.r(expr("percentile(value, 0.5)"), 4).as("exact_p50"),
          (abs(approx_count_distinct(col("user_id"), 0.01) -
            countDistinct(col("user_id"))) <=
            greatest(countDistinct(col("user_id")) * 0.05, lit(1.0)))
            .cast("int").as("hll_within_5pct"),
          (percentile_approx(col("value"), lit(0.5), lit(10000))
            .between(min(col("value")), max(col("value"))))
            .cast("int").as("p50_in_range"))
        .orderBy("event_type"),
    Some(s"""
      SELECT event_type,
             count(DISTINCT user_id) AS exact_users,
             ${Ql.R("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)", 4)} AS exact_p50,
             1 AS hll_within_5pct,
             1 AS p50_in_range
      FROM events GROUP BY 1 ORDER BY 1
    """))

  /** D5: rollup + grouping_id — multi-granularity report. */
  private val aggRollup = QueryDef(
    "q_agg_rollup",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      val r = Tables.region(spark, sfDir)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), grouping_id().as("gid"))
        .select(
          coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("n_cust"), col("gid"))
        .orderBy("gid", "region", "nation")
    },
    Some("""
      SELECT coalesce(r_name, '(all)') AS region,
             coalesce(n_name, '(all)') AS nation,
             count(*) AS n_cust,
             CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY gid, region, nation
    """))

  /** D5: cube over two independent dimensions. */
  private val aggCube = QueryDef(
    "q_agg_cube",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("gid"))
        .orderBy("gid", "status", "priority"),
    Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS status,
             coalesce(o_orderpriority, '(all)') AS priority,
             count(*) AS n,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority
    """))

  /** D5: explicit GROUPING SETS (the general form rollup/cube specialize)
    * via the Spark 4 Dataset.groupingSets API — here an asymmetric set
    * {(status, priority), (priority), ()} that neither rollup nor cube
    * expresses.
    */
  private val aggGroupingSets = QueryDef(
    "q_agg_grouping_sets",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("gid"))
        .orderBy("gid", "status", "priority"),
    Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS status,
             coalesce(o_orderpriority, '(all)') AS priority,
             count(*) AS n,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderpriority), ())
      ORDER BY gid, status, priority
    """))

  /** D6 (Spark 4): listagg — SQL-standard ordered string aggregation
    * (WITHIN GROUP), the direct form of the collect+join idiom below.
    */
  private val aggListagg = QueryDef(
    "q_agg_listagg",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .groupBy("o_orderpriority")
        .agg(
          expr("listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority,
             string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
             count(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1
    """))

  /** D6: collect_set — gathered group elements, sorted for determinism.
    * The set is emitted as a comma-joined string (numeric sort first): the
    * verify harness hashes flat scalar columns, and a raw array column is
    * unhashable downstream. Same information, stable shape.
    */
  private val aggCollect = QueryDef(
    "q_agg_collect",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS INT)"))
        .filter(col("k") < 25)
        .groupBy("event_type")
        .agg(
          array_join(transform(array_sort(collect_set(col("k"))),
            _.cast("string")), ",").as("ks"),
          size(collect_set(col("k"))).as("n_ks"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             array_to_string(list_sort(list(DISTINCT k)), ',') AS ks,
             CAST(len(list(DISTINCT k)) AS INT) AS n_ks
      FROM (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events)
      WHERE k < 25
      GROUP BY 1 ORDER BY 1
    """))

  /** D7: exact percentiles (linear interpolation, = percentile_cont). */
  private val aggPercentile = QueryDef(
    "q_agg_percentile",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy("event_type")
        .agg(
          Ql.r(expr("percentile(value, 0.5)")).as("p50"),
          Ql.r(expr("percentile(value, 0.9)")).as("p90"),
          Ql.r(expr("percentile(value, 0.99)")).as("p99"))
        .orderBy("event_type"),
    Some(s"""
      SELECT event_type,
             ${Ql.R("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)")} AS p50,
             ${Ql.R("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)")} AS p90,
             ${Ql.R("percentile_cont(0.99) WITHIN GROUP (ORDER BY value)")} AS p99
      FROM events GROUP BY 1 ORDER BY 1
    """))

  /** D8: statistical aggregates. (skewness/kurtosis intentionally excluded
    * from the oracle: Spark computes population moments, DuckDB sample
    * moments — numerically different definitions.)
    */
  private val aggStats = QueryDef(
    "q_agg_stats",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(
          Ql.r(stddev_samp(col("l_quantity"))).as("sd_qty"),
          Ql.r(var_samp(col("l_quantity"))).as("var_qty"),
          Ql.r(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          Ql.r(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qty_disc"))
        .orderBy("l_returnflag"),
    Some(s"""
      SELECT l_returnflag,
             ${Ql.R("stddev_samp(l_quantity)")} AS sd_qty,
             ${Ql.R("var_samp(l_quantity)")} AS var_qty,
             ${Ql.R("corr(l_quantity, l_extendedprice)", 4)} AS corr_qty_price,
             ${Ql.R("covar_samp(l_quantity, l_discount)", 4)} AS covar_qty_disc
      FROM lineitem GROUP BY 1 ORDER BY 1
    """))

  /** D11: pivot — event_type values to columns, one row per day. */
  private val aggPivot = QueryDef(
    "q_agg_pivot",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("day", to_date(col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
        .orderBy("day"),
    Some("""
      SELECT CAST(ts AS DATE) AS day,
             count(*) FILTER (WHERE event_type = 'click') AS "click",
             count(*) FILTER (WHERE event_type = 'view') AS "view",
             count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
             count(*) FILTER (WHERE event_type = 'signup') AS "signup",
             count(*) FILTER (WHERE event_type = 'error') AS "error"
      FROM events GROUP BY 1 ORDER BY 1
    """))

  /** D11 inverse: unpivot/melt — wide metrics back to (key, metric, value)
    * rows (Dataset.unpivot, the UNPIVOT shape).
    */
  private val aggUnpivot = QueryDef(
    "q_agg_unpivot",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(
          Ql.r(sum(col("l_quantity"))).as("qty"),
          Ql.r(sum(col("l_discount"))).as("disc"),
          Ql.r(sum(col("l_tax"))).as("tax"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("disc"), col("tax")),
          "metric", "value")
        .orderBy("l_returnflag", "metric"),
    Some(s"""
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag,
               ${Ql.R("sum(l_quantity)")} AS qty,
               ${Ql.R("sum(l_discount)")} AS disc,
               ${Ql.R("sum(l_tax)")} AS tax
        FROM lineitem GROUP BY 1)
      UNPIVOT (value FOR metric IN (qty, disc, tax))
      ORDER BY l_returnflag, metric
    """))

  /** D4b: mergeable distinct sketches — per-day HLL sketches of user_id
    * (Spark 4 DataSketches `hll_sketch_agg`) unioned per event_type with
    * `hll_union_agg`, estimated, and checked against the exact distinct.
    * THE 100 TB distinct-count pattern: daily partitions aggregate once
    * into ~KB sketches, and any rollup (weekly, all-time) is a sketch
    * union — no re-scan of raw data. Sketch estimates are engine-specific,
    * so the oracle contract is q_agg_approx's: exact columns plus a
    * bounded-error flag that must come out 1.
    */
  private val aggHllMerge = QueryDef(
    "q_agg_hll_merge",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      val daily = e.groupBy("event_type", "day")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
          countDistinct(col("user_id")).as("daily_users"))
      val merged = daily.groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"),
          count(lit(1)).as("n_days"),
          sum(col("daily_users")).as("sum_daily_users"))
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"), col("n_days"),
          col("sum_daily_users"),
          (abs(col("est") - col("exact_users")) <=
            greatest(col("exact_users") * 0.05, lit(1.0)))
            .cast("int").as("merged_within_5pct"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS exact_users,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
             CAST((SELECT sum(du) FROM (
                SELECT count(DISTINCT user_id) AS du
                FROM events i
                WHERE i.event_type = o.event_type
                GROUP BY CAST(ts AS DATE))) AS BIGINT) AS sum_daily_users,
             1 AS merged_within_5pct
      FROM events o GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] = Seq(
    pricingSummary, aggDistinct, aggApprox, aggRollup, aggCube,
    aggGroupingSets, aggListagg, aggCollect, aggPercentile, aggStats,
    aggPivot, aggUnpivot, aggHllMerge)
}
