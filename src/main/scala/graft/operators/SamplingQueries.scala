package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling (SURVEY §2.I extension) — the
  * reproducible-pipeline complement to `df.sample` (which is spec-tested in
  * SamplingSpec but engine-specific, so it can't hash-match an oracle).
  * A row's bucket is a pure function of its key — `md5(key)`'s first 4 hex
  * digits mod 100 — so the SAME rows are selected on every engine, every
  * run, every partitioning: exactly how a training pipeline pins its
  * train/val/test membership so reruns and backfills don't shuffle the
  * split. Rates are bucket thresholds; stratified rates are per-key
  * thresholds.
  */
object SamplingQueries extends QueryModule {

  /** Spark-side bucket 0..99 from a (string-cast) key column expression.
    * `private[graft]` so SamplingSpec tests the production expression.
    */
  private[graft] def bucketExpr(key: String): String =
    s"${Ql.md5PrefixLong(s"CAST($key AS STRING)", 4)} % 100"

  /** DuckDB twin of [[bucketExpr]]. */
  private[graft] def bucketSql(key: String): String =
    s"${Ql.Md5PrefixLong(s"CAST($key AS VARCHAR)", 4)} % 100"

  /** 80/10/10 train/val/test split of events, pinned by event_id hash:
    * per-split counts and value stats — and the memberships are stable
    * under replay/repartition because bucket = f(event_id) alone.
    */
  private val trainSplit = QueryDef(
    "q_train_split",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("bucket", expr(bucketExpr("event_id")))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          Ql.r(avg(col("value")), 4).as("avg_value"))
        .orderBy("split"),
    Some(s"""
      SELECT split, count(*) AS n,
             count(DISTINCT user_id) AS n_users,
             ${Ql.R("avg(value)", 4)} AS avg_value
      FROM (SELECT user_id, value,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT user_id, value, ${bucketSql("event_id")} AS b
                  FROM events))
      GROUP BY 1 ORDER BY 1
    """))

  /** Stratified deterministic sample of documents: per-language rates
    * (downsample the dominant stratum, keep more of the rare ones) via
    * per-key bucket thresholds on md5(doc_id).
    */
  private val sampleStratified = QueryDef(
    "q_sample_stratified",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .withColumn("bucket", expr(bucketExpr("doc_id")))
        .withColumn("rate",
          when(col("lang") === "en", 10).otherwise(30))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum((col("bucket") < col("rate")).cast("long")).as("n_sampled"))
        .orderBy("lang"),
    Some(s"""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      FROM (SELECT lang, ${bucketSql("doc_id")} AS b,
                   CASE WHEN lang = 'en' THEN 10 ELSE 30 END AS rate
            FROM documents)
      GROUP BY 1 ORDER BY 1
    """))

  /** Temperature-scaled mixture weights for language/domain balancing
    * (the multilingual-corpus sampling rule from the XLM-R line of work,
    * public): p_l ∝ (n_l/N)^α with α=0.3 lifts low-resource languages
    * toward parity without drowning the head. The whole computation is
    * group-count-sized — one keyed count, two 1-row broadcasts (corpus
    * total, normalizer) — so at 100 TB it is one aggregation over the
    * corpus and then arithmetic on a handful of rows. `pow` outputs are
    * rounded to 6 dp before normalization in both engines (libm vs JVM
    * pow ulp hygiene); expected_docs shows the resulting 10k-doc budget
    * allocation.
    */
  private val temperatureSampling = QueryDef(
    "q_temperature_sampling",
    (spark, sfDir) => {
      val byLang = Tables.documents(spark, sfDir)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val tot = byLang.agg(sum(col("n_docs")).cast("double").as("n"))
      val w = byLang.crossJoin(broadcast(tot))
        .withColumn("share", Ql.r(col("n_docs") / col("n"), 6))
        .withColumn("wt", Ql.r(pow(col("n_docs") / col("n"), 0.3), 6))
      val z = w.agg(Ql.r(sum(col("wt")), 6).as("z"))
      w.crossJoin(broadcast(z))
        .withColumn("p", Ql.r(col("wt") / col("z"), 6))
        .select(col("lang"), col("n_docs"), col("share"), col("wt"), col("p"),
          Ql.r(col("p") * 10000, 2).as("expected_docs"))
        .orderBy("lang")
    },
    Some(s"""
      WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n FROM c),
      w AS (
        SELECT lang, n_docs,
               ${Ql.R("n_docs / n", 6)} AS share,
               ${Ql.R("pow(n_docs / n, 0.3)", 6)} AS wt
        FROM c, tot),
      z AS (SELECT ${Ql.R("sum(wt)", 6)} AS z FROM w)
      SELECT lang, n_docs, share, wt,
             ${Ql.R("wt / z", 6)} AS p,
             ${Ql.R(Ql.R("wt / z", 6) + " * 10000", 2)} AS expected_docs
      FROM w, z ORDER BY lang
    """))

  /** Deterministic weighted sample: top-50 documents by the priority key
    * w·u/(1−u), where w = n_chars and u = md5(doc_id)'s first 56 bits
    * mapped to [0,1) — a weighted priority sample in the
    * Efraimidis–Spirakis key-per-row mold (2006, public), with a RATIONAL
    * key instead of u^(1/w): monotone in u, linear in w (double the
    * weight, double the expected priority), and — the reason for the
    * substitution — computed entirely from exact IEEE divides/multiplies
    * on bit-identical operands (u's denominator is 2^56, an exact power
    * of two), so both engines rank the SAME doubles with no libm in
    * sight. Membership is a pure function of (doc_id, n_chars): stable
    * under replay, repartition, and backfill, like every sampler here.
    * At 100 TB this is TakeOrderedAndProject — per-partition top-50, then
    * a 50-row merge on the driver of each partition's survivors.
    */
  private val weightedSample = QueryDef(
    "q_weighted_sample",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        // the 2^56 denominator must be a DOUBLE cast, not a `…936.0`
        // literal — Spark parses the latter as DECIMAL(19,1) and the
        // whole key silently becomes decimal arithmetic
        .withColumn("u", expr(
          s"${Ql.md5PrefixLong("CAST(doc_id AS STRING)", 14)}" +
            " / CAST(72057594037927936 AS DOUBLE)"))
        .withColumn("priority", col("n_chars") * col("u") / (lit(1.0) - col("u")))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          Ql.r(col("priority"), 4).as("priority")),
    Some(s"""
      WITH k AS (
        SELECT doc_id, lang, n_chars,
               n_chars * u / (1.0 - u) AS pr
        FROM (SELECT doc_id, lang, n_chars,
                     ${Ql.Md5PrefixLong("CAST(doc_id AS VARCHAR)", 14)}
                       / CAST(72057594037927936 AS DOUBLE) AS u
              FROM documents))
      SELECT doc_id, lang, n_chars, ${Ql.R("pr", 4)} AS priority
      FROM k ORDER BY pr DESC, doc_id LIMIT 50
    """))

  /** A/B test readout — the experimentation operator on top of the
    * deterministic assignment primitive: users hash into arms by the
    * same md5-bucket rule as q_train_split (assignment is a pure
    * function of user_id — stable under replay, immune to traffic
    * reordering), the metric is purchase conversion, and the readout is
    * the two-proportion z-test with a sample-ratio-mismatch guard (an
    * SRM χ² > 3.84 means the assignment itself broke — read THAT before
    * reading the p-value; Kohavi et al.'s standard trustworthiness
    * check, public). Everything reduces over per-arm integer counters
    * (one user-keyed aggregation, then arm-sized arithmetic); z and χ²
    * are the only doubles, rounded at 4 dp.
    */
  private val abTest = QueryDef(
    "q_ab_test",
    (spark, sfDir) => {
      val perUser = Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(max((col("event_type") === "purchase" && col("value") > 180).cast("long"))
          .as("converted"))
        .withColumn("arm",
          when(expr(bucketExpr("user_id")) < 50, "A").otherwise("B"))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val a = arms.filter(col("arm") === "A")
        .select(col("n").as("n_a"), col("conv").as("conv_a"))
      val bb = arms.filter(col("arm") === "B")
        .select(col("n").as("n_b"), col("conv").as("conv_b"))
      a.crossJoin(broadcast(bb)) // two 1-row arm summaries
        .withColumn("rate_a", Ql.r(col("conv_a").cast("double") / col("n_a"), 4))
        .withColumn("rate_b", Ql.r(col("conv_b").cast("double") / col("n_b"), 4))
        .withColumn("pool",
          (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b")))
        .withColumn("z",
          when(col("pool") === 0.0 || col("pool") === 1.0, lit(0.0)).otherwise(Ql.r(
            (col("conv_a").cast("double") / col("n_a") - col("conv_b").cast("double") / col("n_b"))
              / sqrt(col("pool") * (lit(1.0) - col("pool"))
                * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)))
        .withColumn("srm_chi2", Ql.r(
          (col("n_a") - col("n_b")).cast("double") * (col("n_a") - col("n_b"))
            / (col("n_a") + col("n_b")), 4))
        .select(col("n_a"), col("conv_a"), col("rate_a"),
          col("n_b"), col("conv_b"), col("rate_b"),
          col("z"), (abs(col("z")) > 1.96).cast("int").as("significant_05"),
          col("srm_chi2"), (col("srm_chi2") > 3.84).cast("int").as("srm_flag"))
    },
    Some(s"""
      WITH perUser AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS converted,
               CASE WHEN ${bucketSql("user_id")} < 50 THEN 'A' ELSE 'B' END AS arm
        FROM events GROUP BY user_id),
      arms AS (
        SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
        FROM perUser GROUP BY 1),
      a AS (SELECT n AS n_a, conv AS conv_a FROM arms WHERE arm = 'A'),
      b AS (SELECT n AS n_b, conv AS conv_b FROM arms WHERE arm = 'B'),
      s AS (
        SELECT *,
               CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pool
        FROM a, b),
      z AS (
        SELECT n_a, conv_a, n_b, conv_b,
               ${Ql.R("CAST(conv_a AS DOUBLE) / n_a", 4)} AS rate_a,
               ${Ql.R("CAST(conv_b AS DOUBLE) / n_b", 4)} AS rate_b,
               CASE WHEN pool = 0.0 OR pool = 1.0 THEN 0.0 ELSE
                 ${Ql.R("""(CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt(pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b))""", 4)} END AS z,
               ${Ql.R("CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b)", 4)} AS srm_chi2
        FROM s)
      SELECT n_a, conv_a, rate_a, n_b, conv_b, rate_b, z,
             CAST(abs(z) > 1.96 AS INT) AS significant_05,
             srm_chi2, CAST(srm_chi2 > 3.84 AS INT) AS srm_flag
      FROM z
    """))

  /** Top-p (nucleus) corpus filtering per language — keep the smallest
    * prefix of hash-priority-ranked documents whose token mass reaches
    * p=0.9 of the language total (the nucleus-sampling idea applied to
    * corpus budgeting: spend the token budget on a mass quantile, not a
    * count quantile). Language cardinality is tiny, so a lang-partitioned
    * prefix window would funnel O(corpus) rows through a handful of
    * tasks — instead the per-language running mass uses the two-level
    * bucket-offset pattern (EvalQueries.bucketOffsets' shape, here keyed
    * per (lang, hash-prefix bucket)): a ≤ langs×256-row broadcast
    * histogram carries each bucket's exclusive mass offset, and the only
    * window over corpus rows is partitioned by (lang, bkt) — 256-way
    * parallel per language at any scale. The per-language total is a
    * broadcast join of the histogram rollup, not a whole-partition
    * window. The kept/cut decision compares exact integer character
    * masses cross-multiplied against p as the rational 9/10 — no float
    * threshold anywhere. A document is kept while the mass BEFORE it is
    * under p (so the boundary doc that crosses p is included,
    * guaranteeing ≥p coverage). Reports the per-language keep counts,
    * kept mass, and realized coverage.
    */
  private val topPFilter = QueryDef(
    "q_top_p_filter",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          expr(Ql.md5PrefixLong("CAST(doc_id AS STRING)", 14)).as("h"))
        // top-8-bit bucket of the 56-bit priority hash: bucket order IS
        // hash order, so per-bucket offsets + in-bucket prefixes compose
        // to the exact per-language global prefix sum
        .withColumn("bkt", shiftright(col("h"), 48))
      val hist = d.groupBy("lang", "bkt").agg(sum("n_chars").as("b_mass"))
      val wOff = Window.partitionBy("lang").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = hist // histogram rows: ≤ langs × 256 — broadcastable
        .withColumn("off", coalesce(sum("b_mass").over(wOff), lit(0L)))
        .select("lang", "bkt", "off")
      val totals = hist.groupBy("lang").agg(sum("b_mass").as("total"))
      val wIn = Window.partitionBy("lang", "bkt").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      d.join(broadcast(offsets), Seq("lang", "bkt"))
        .join(broadcast(totals), Seq("lang"))
        .withColumn("before",
          col("off") + coalesce(sum("n_chars").over(wIn), lit(0L)))
        // keep while mass before this doc < 0.9 of total: 10*before < 9*total
        .withColumn("keep", (col("before") * 10 < col("total") * 9).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("keep").as("n_kept"),
          max("total").as("total_chars"),
          sum(col("keep") * col("n_chars")).as("kept_chars"))
        .selectExpr("lang", "n_docs", "n_kept", "total_chars", "kept_chars",
          s"${Ql.R("100.0 * kept_chars / total_chars", 4)} AS coverage_pct")
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, lang, n_chars,
               ${Ql.Md5PrefixLong("CAST(doc_id AS VARCHAR)", 14)} AS h
        FROM documents),
      m AS (
        SELECT lang, n_chars,
               COALESCE(sum(n_chars) OVER (PARTITION BY lang ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
               sum(n_chars) OVER (PARTITION BY lang) AS total
        FROM d),
      k AS (
        SELECT lang, n_chars, total,
               CASE WHEN before * 10 < total * 9 THEN 1 ELSE 0 END AS keep
        FROM m)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(keep) AS BIGINT) AS n_kept,
             CAST(max(total) AS BIGINT) AS total_chars,
             CAST(sum(keep * n_chars) AS BIGINT) AS kept_chars,
             ${Ql.R("100.0 * sum(keep * n_chars) / max(total)", 4)} AS coverage_pct
      FROM k GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] =
    Seq(trainSplit, sampleStratified, temperatureSampling, weightedSample,
      abTest, topPFilter)
}
