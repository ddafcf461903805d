package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-modeling operators over the warehouse tables: closed-form
  * model fits (ridge via normal equations, per-segment OLS trends), the
  * scale-out bootstrap (Poisson resampling — the only bootstrap that works
  * as one pass at 100 TB), sequential forecasting (Holt's linear method
  * over a calendar-bounded series), systematic sampling over distributed
  * global ordinals, and decayed-engagement feature scoring.
  *
  * Determinism discipline (QueryDef contract): every sum that feeds an
  * integer decision runs in exact BIGINT (quantities, cents, discount
  * points, micro-weight units); genuinely real-valued model outputs are
  * computed from those exact integer sums via formula text SHARED between
  * the Spark expression and the DuckDB oracle (identical parse ⇒ identical
  * IEEE evaluation — NOTES.md fact #25), then [[Ql.r]]-rounded.
  */
object StatQueries extends QueryModule {

  // ---------------------------------------------------------------- ridge regression

  /** Ridge regression fit in closed form by the 2×2 normal equations
    * (no intercept; features x1 = l_quantity, x2 = discount points,
    * target y = price cents; λ = 1000 in raw units):
    * β = (XᵀX + λI)⁻¹ Xᵀy solved by the explicit 2×2 inverse. This is
    * the 100 TB linear-model shape: ONE aggregation over the fact table
    * produces the five sufficient statistics (Σx1², Σx1x2, Σx2², Σx1y,
    * Σx2y) with map-side partial aggregation — model fitting never
    * shuffles rows, only the 5-number summary. All five sums are exact
    * BIGINT (x1 ≤ 50, x2 ≤ 10 points, y ≤ 1e7 cents ⇒ Σx1y ≤ ~5e14 at
    * sf0.1; the int64 ceiling lands near sf ~1e4 — past that the sums
    * switch to DOUBLE and this oracle-exactness note is void). The solve
    * arithmetic is a formula text shared verbatim with the oracle, so
    * both engines compute bit-identical doubles from identical integers.
    */
  private val ridge: QueryDef = {
    val det = "(CAST(s11 AS DOUBLE) + 1000.0) * (s22 + 1000.0) - CAST(s12 AS DOUBLE) * s12"
    val beta1 = s"((s22 + 1000.0) * b1 - CAST(s12 AS DOUBLE) * b2) / ($det)"
    val beta2 = s"((CAST(s11 AS DOUBLE) + 1000.0) * b2 - CAST(s12 AS DOUBLE) * b1) / ($det)"
    // probe prediction: qty 30, 5 discount points, output in dollars
    val yhat = s"(($beta1) * 30.0 + ($beta2) * 5.0) / 100.0"
    QueryDef(
      "q_ridge_regression",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(
            col("l_quantity").cast("long").as("x1"),
            Ql.r(col("l_discount") * 100, 0).cast("long").as("x2"),
            Ql.r(col("l_extendedprice") * 100, 0).cast("long").as("y"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("x1") * col("x1")).as("s11"),
            sum(col("x1") * col("x2")).as("s12"),
            sum(col("x2") * col("x2")).as("s22"),
            sum(col("x1") * col("y")).as("b1"),
            sum(col("x2") * col("y")).as("b2"))
          .selectExpr(
            "n", "s11", "s12", "s22", "b1", "b2",
            s"${Ql.R(beta1, 4)} AS beta1_cents",
            s"${Ql.R(beta2, 4)} AS beta2_cents",
            s"${Ql.R(yhat, 2)} AS yhat_probe"),
      Some(s"""
        WITH r AS (
          SELECT CAST(l_quantity AS BIGINT) AS x1,
                 CAST(${Ql.R("l_discount * 100", 0)} AS BIGINT) AS x2,
                 CAST(${Ql.R("l_extendedprice * 100", 0)} AS BIGINT) AS y
          FROM lineitem),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x1 * x1) AS BIGINT) AS s11,
                 CAST(sum(x1 * x2) AS BIGINT) AS s12,
                 CAST(sum(x2 * x2) AS BIGINT) AS s22,
                 CAST(sum(x1 * y) AS BIGINT) AS b1,
                 CAST(sum(x2 * y) AS BIGINT) AS b2
          FROM r)
        SELECT n, s11, s12, s22, b1, b2,
               ${Ql.R(beta1, 4)} AS beta1_cents,
               ${Ql.R(beta2, 4)} AS beta2_cents,
               ${Ql.R(yhat, 2)} AS yhat_probe
        FROM s
      """))
  }

  // ---------------------------------------------------------------- per-segment OLS trend

  /** Per-segment OLS trend over the daily event-value series: for each
    * event type, regress the (6 dp-rounded) daily mean on the day index
    * and report slope, intercept, R², and the one-day-ahead forecast —
    * the "is this metric drifting and where will it be tomorrow"
    * dashboard readout. The regression runs on the DAILY table (rows =
    * calendar days × types, bounded by the calendar, not the corpus), so
    * at 100 TB the only corpus-sized work is the first keyed daily
    * aggregation; the built-in regr_* aggregates keep the fit inside
    * codegen. The day index is an exact integer day difference from the
    * global min day (a 1-row broadcast, never a collect).
    */
  private val linearTrend = QueryDef(
    "q_linear_trend",
    (spark, sfDir) => {
      val daily = Tables.events(spark, sfDir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(Ql.r(avg(col("value")), 6).as("y"))
      val minDay = daily.agg(min("day").as("d0"))
      daily.crossJoin(broadcast(minDay))
        .withColumn("x", datediff(col("day"), col("d0")).cast("double"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_days"),
          Ql.r(expr("regr_slope(y, x)"), 4).as("slope"),
          Ql.r(expr("regr_intercept(y, x)"), 4).as("intercept"),
          Ql.r(expr("regr_r2(y, x)"), 4).as("r2"),
          Ql.r(expr("regr_intercept(y, x) + regr_slope(y, x) * (max(x) + 1)"), 4)
            .as("forecast_next"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               ${Ql.R("avg(value)", 6)} AS y
        FROM events GROUP BY 1, 2),
      d0 AS (SELECT min(day) AS d0 FROM daily),
      xy AS (
        SELECT event_type, CAST(date_diff('day', d0, day) AS DOUBLE) AS x, y
        FROM daily CROSS JOIN d0)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             ${Ql.R("regr_slope(y, x)", 4)} AS slope,
             ${Ql.R("regr_intercept(y, x)", 4)} AS intercept,
             ${Ql.R("regr_r2(y, x)", 4)} AS r2,
             ${Ql.R("regr_intercept(y, x) + regr_slope(y, x) * (max(x) + 1)", 4)} AS forecast_next
      FROM xy GROUP BY event_type ORDER BY event_type
    """))

  // ---------------------------------------------------------------- Poisson bootstrap CI

  /** Bootstrap confidence interval for the mean order value via the
    * POISSON bootstrap (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012): classical resampling needs n
    * draws WITH replacement per replicate — impossible in one pass — but
    * Poisson(1) per-row replicate weights are i.i.d.-close and embarrass-
    * ingly parallel: each row computes its own B weights from a hash,
    * the replicate sums partial-aggregate map-side, and the shuffle
    * carries B=32 rows. THE bootstrap shape that survives 100 TB.
    * Weights are drawn by inverting the Poisson(1) CDF on a 28-bit hash
    * uniform — an exact INTEGER threshold compare (thresholds are
    * floor(cdf·2²⁸), spliced as literals into both engines), so every
    * row's weight is deterministic and identical in both engines; the
    * replicate means divide exact BIGINT cent sums. The CI is the
    * [5th, 95th] percentile of the 32 replicate means (interpolation on
    * a 32-row frame; both engines use the (n−1)·p linear-interpolation
    * definition).
    */
  private val bootstrapCi: QueryDef = {
    // cumulative Poisson(1) CDF as exact 28-bit integer thresholds
    val e1 = math.exp(-1.0)
    val cdf = Seq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0).map(_ * e1)
    val Seq(t0, t1, t2, t3, t4) = cdf.map(c => (c * 268435456.0).toLong)
    val wCase = s"""CASE WHEN u < $t0 THEN 0 WHEN u < $t1 THEN 1
                         WHEN u < $t2 THEN 2 WHEN u < $t3 THEN 3
                         WHEN u < $t4 THEN 4 ELSE 5 END"""
    QueryDef(
      "q_bootstrap_ci",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"),
            Ql.r(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val reps = o
          .select(col("o_orderkey"), col("cents"),
            explode(sequence(lit(0), lit(31))).as("b"))
          .withColumn("u",
            expr(Ql.md5PrefixLong("concat(o_orderkey, ':', b)", 7)))
          .withColumn("w", expr(wCase))
          .groupBy("b")
          .agg(sum("w").as("n_b"), sum(col("w") * col("cents")).as("cents_b"))
          .select(col("b"), (col("cents_b") / 100.0 / col("n_b")).as("mean_b"))
        val truth = o.agg(count(lit(1)).as("n"),
          Ql.r(sum("cents") / 100.0 / count(lit(1)), 2).as("mean_true"))
        reps.agg(
            count(lit(1)).as("n_reps"),
            Ql.r(avg("mean_b"), 2).as("boot_mean"),
            Ql.r(expr("percentile(mean_b, 0.05)"), 2).as("ci_lo"),
            Ql.r(expr("percentile(mean_b, 0.95)"), 2).as("ci_hi"))
          .crossJoin(broadcast(truth))
          .select("n", "mean_true", "n_reps", "boot_mean", "ci_lo", "ci_hi")
      },
      Some(s"""
        WITH o AS (
          SELECT o_orderkey,
                 CAST(${Ql.R("o_totalprice * 100", 0)} AS BIGINT) AS cents
          FROM orders),
        reps AS (
          SELECT b, CAST(sum(w) AS BIGINT) AS n_b,
                 CAST(sum(w * cents) AS BIGINT) AS cents_b
          FROM (
            SELECT cents, b, $wCase AS w
            FROM (
              SELECT o_orderkey, cents, unnest(generate_series(0, 31)) AS b,
                     ${Ql.Md5PrefixLong(
                       "CAST(o_orderkey AS VARCHAR) || ':' || CAST(unnest(generate_series(0, 31)) AS VARCHAR)", 7)} AS u
              FROM o))
          GROUP BY b),
        m AS (SELECT b, cents_b / 100.0 / n_b AS mean_b FROM reps),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     ${Ql.R("sum(cents) / 100.0 / count(*)", 2)} AS mean_true
              FROM o)
        SELECT t.n, t.mean_true,
               CAST(count(*) AS BIGINT) AS n_reps,
               ${Ql.R("avg(mean_b)", 2)} AS boot_mean,
               ${Ql.R("percentile_cont(0.05) WITHIN GROUP (ORDER BY mean_b)", 2)} AS ci_lo,
               ${Ql.R("percentile_cont(0.95) WITHIN GROUP (ORDER BY mean_b)", 2)} AS ci_hi
        FROM m CROSS JOIN t GROUP BY t.n, t.mean_true
      """))
  }

  // ---------------------------------------------------------------- systematic sampling

  /** Systematic sampling (every 100th element of a deterministic
    * hash-shuffled order, offset 50) — the classic audit/QA sample with
    * guaranteed even coverage of the keyspace. The "shuffled order" is
    * the 56-bit md5 of the order key, and the global ordinal over it is
    * assigned WITHOUT a single-partition sort by the two-level pattern
    * (q_global_ordinals): 16 hash-range buckets (top 4 bits — a PREFIX
    * of the sort order, so bucket offsets + in-bucket ranks compose to
    * the exact global rank), per-bucket distributed windows, offsets
    * from the 16-row histogram. The oracle proves the composition IS
    * row_number over the global hash order.
    */
  private val sampleSystematic = QueryDef(
    "q_sample_systematic",
    (spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          expr(Ql.md5PrefixLong("CAST(o_orderkey AS STRING)", 14)).as("h"))
        .withColumn("bkt", expr("shiftright(h, 52)"))
      val offsets = o.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("offset",
          coalesce(sum(col("cnt")).over(
            Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bkt", "offset")
      val inBucket = Window.partitionBy("bkt").orderBy("h", "o_orderkey")
      o.join(broadcast(offsets), "bkt")
        .withColumn("rn", col("offset") + row_number().over(inBucket))
        .filter(col("rn") % 100 === 50)
        .select(col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("rn")
    },
    Some(s"""
      WITH h AS (
        SELECT o_orderkey, o_totalprice,
               ${Ql.Md5PrefixLong("CAST(o_orderkey AS VARCHAR)", 14)} AS h
        FROM orders),
      r AS (
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY h, o_orderkey) AS rn
        FROM h)
      SELECT rn, o_orderkey, o_totalprice
      FROM r WHERE rn % 100 = 50 ORDER BY rn
    """))

  // ---------------------------------------------------------------- Holt's linear forecast

  /** Holt's linear-trend double exponential smoothing (α=0.4, β=0.3)
    * over the per-type daily mean series, with the 7-day-ahead forecast
    * l + 7b — the level+trend upgrade of q_ewma_daily. Unlike EWMA the
    * coupled recursion has no single-window closed form, so the engine
    * folds it SEQUENTIALLY with the aggregate() higher-order function
    * over the sorted collected series — legitimate exactly because the
    * series is CALENDAR-BOUNDED (days × types, ~30 rows per type here;
    * thousands at worst), never corpus-sized; the corpus-scaled work is
    * only the daily aggregation feeding it. Initialization l₂=x₂,
    * b₂=x₂−x₁ (Hyndman & Athanasopoulos §8.2), recursion from t=3. The
    * oracle runs the identical recursion as a recursive CTE; both
    * engines evaluate the SAME arithmetic text over the SAME 6 dp-
    * rounded daily means in the same order ⇒ identical IEEE doubles.
    */
  private val holtForecast: QueryDef = {
    val newL = "0.4 * x + 0.6 * (acc.l + acc.b)"
    QueryDef(
      "q_holt_forecast",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(Ql.r(avg(col("value")), 6).as("x"))
          .groupBy("event_type")
          .agg(expr("transform(array_sort(collect_list(struct(day, x))), a -> a.x)").as("xs"))
          .selectExpr(
            "event_type",
            "CAST(size(xs) AS BIGINT) AS n_days",
            s"""aggregate(
                  slice(xs, 3, size(xs) - 2),
                  named_struct('l', element_at(xs, 2),
                               'b', element_at(xs, 2) - element_at(xs, 1)),
                  (acc, x) -> named_struct(
                    'l', $newL,
                    'b', 0.3 * (($newL) - acc.l) + 0.7 * acc.b),
                  acc -> acc) AS hb""")
          .selectExpr(
            "event_type", "n_days",
            s"${Ql.R("hb.l", 4)} AS level",
            s"${Ql.R("hb.b", 4)} AS trend",
            s"${Ql.R("hb.l + 7 * hb.b", 4)} AS forecast_7d")
          .orderBy("event_type"),
      Some(s"""
        WITH RECURSIVE daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 ${Ql.R("avg(value)", 6)} AS x
          FROM events GROUP BY 1, 2),
        seq AS (
          SELECT event_type, x,
                 row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
          FROM daily),
        n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
              FROM seq GROUP BY 1),
        rec AS (
          SELECT s2.event_type, 2 AS t, s2.x AS l, s2.x - s1.x AS b
          FROM seq s1 JOIN seq s2
            ON s1.event_type = s2.event_type AND s1.rn = 1 AND s2.rn = 2
          UNION ALL
          SELECT r.event_type, r.t + 1,
                 0.4 * x + 0.6 * (r.l + r.b),
                 0.3 * ((0.4 * x + 0.6 * (r.l + r.b)) - r.l) + 0.7 * r.b
          FROM rec r JOIN seq s
            ON s.event_type = r.event_type AND s.rn = r.t + 1)
        SELECT r.event_type, n.n_days,
               ${Ql.R("r.l", 4)} AS level,
               ${Ql.R("r.b", 4)} AS trend,
               ${Ql.R("r.l + 7 * r.b", 4)} AS forecast_7d
        FROM rec r
          JOIN n ON n.event_type = r.event_type AND r.t = n.n_days
        ORDER BY r.event_type
      """))
  }

  // ---------------------------------------------------------------- decayed engagement

  /** Exponentially-decayed engagement scoring — the feature-store
    * recency×frequency signal: each user's score is Σ 0.9^(days back)
    * over their events, histogrammed in half-unit buckets. The decay
    * weights are pre-tabulated INTEGER micro-units (round(0.9^k·1e6),
    * generated once as a shared CASE text), so per-user sums are exact
    * BIGINTs — no float summation order to diverge on, no cross-libm
    * pow() risk (NOTES.md #25 extended: pow(0.9, k) is not bit-guaranteed
    * across engines; a 30-entry literal table is). Scale shape: one
    * groupBy user (corpus-sized, map-side partial) + one bucket histogram
    * (tens of rows); the anchor day is a 1-row broadcast.
    */
  private val decayEngagement: QueryDef = {
    val wCase = (0 to 29).map { k =>
      val w = (BigDecimal("0.9").pow(k) * BigDecimal(1000000))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      s"WHEN $k THEN ${w}"
    }.mkString("CASE db ", " ", " ELSE 0 END")
    QueryDef(
      "q_decay_engagement",
      (spark, sfDir) => {
        val e = Tables.events(spark, sfDir)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val anchor = e.agg(max("day").as("maxd"))
        e.crossJoin(broadcast(anchor))
          .withColumn("db", datediff(col("maxd"), col("day")))
          .selectExpr("user_id", s"$wCase AS w")
          .groupBy("user_id")
          .agg(sum("w").as("s_micro"))
          .selectExpr("user_id", "s_micro", "s_micro div 500000 AS bucket")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_users"),
            min("s_micro").as("min_micro"), max("s_micro").as("max_micro"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        a AS (SELECT max(day) AS maxd FROM e),
        w AS (
          SELECT user_id, $wCase AS w
          FROM (SELECT user_id, date_diff('day', day, maxd) AS db
                FROM e CROSS JOIN a)),
        s AS (
          SELECT user_id, CAST(sum(w) AS BIGINT) AS s_micro
          FROM w GROUP BY 1)
        SELECT s_micro // 500000 AS bucket,
               CAST(count(*) AS BIGINT) AS n_users,
               min(s_micro) AS min_micro, max(s_micro) AS max_micro
        FROM s GROUP BY 1 ORDER BY 1
      """))
  }

  def defs: Seq[QueryDef] =
    Seq(ridge, linearTrend, bootstrapCi, sampleSystematic, holtForecast,
      decayEngagement)
}
