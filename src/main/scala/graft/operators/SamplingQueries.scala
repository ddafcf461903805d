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
  private def bucketSql(key: String): String =
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

  override def defs: Seq[QueryDef] =
    Seq(trainSplit, sampleStratified, temperatureSampling, weightedSample)
}
