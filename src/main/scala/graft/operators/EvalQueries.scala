package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/data evaluation metrics — the measurement side of a training-data
  * pipeline (reference provenance: SURVEY.md §2.I mandates the
  * LLM-data-pipeline extension surface; a curation pipeline that cannot
  * score its own outputs cannot be tuned). Every query is exact integer /
  * fixed-literal arithmetic where possible so the DuckDB twin hash-matches:
  * AUC via the tie-corrected rank-sum identity (all-integer until the final
  * divide), NDCG with the 1/log2(i+1) discount table emitted as shared
  * decimal literals (no libm on either engine), Gini via the sorted-index
  * closed form over cent-rounded revenues.
  */
object EvalQueries extends QueryModule {

  /** ROC-AUC of a scalar score against a binary label, computed as the
    * tie-corrected Mann–Whitney U statistic: group by distinct score
    * (positives get the tie-group's AVERAGE rank), then
    * AUC = (2·Σranks⁺ − P(P+1)) / (2·P·N). Everything up to the final
    * divide is 64-bit integer arithmetic — no float associativity to
    * diverge the engines. The ordinal sweep runs over the DISTINCT-score
    * table (tiny vs the input; same rationale as q_skyline's bucket pass —
    * at 100 TB swap in the q_global_ordinals two-level trick).
    * Score = first embedding component, positive class = label 0.
    */
  /** Tie-corrected rank-sum AUC over a DataFrame with columns
    * `score: numeric` and `pos: long ∈ {0,1}` → one row
    * (n_pos, n_neg, auc). Exposed for the definitional spec (the oracle
    * twin shares the same closed form, so only a brute-force pairwise
    * count independently checks the formula).
    */
  def rankSumAuc(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val g = scored.groupBy("score")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val before = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum(col("n")).over(before), lit(0L)))
      .agg(
        sum(col("p") * (lit(2L) * col("cum") + col("n") + lit(1L))).as("s2"),
        sum(col("p")).as("n_pos"),
        sum(col("n") - col("p")).as("n_neg"))
      .select(
        col("n_pos"),
        col("n_neg"),
        Ql.r((col("s2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double")
          / (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  private val auc = QueryDef(
    "q_auc",
    (spark, sfDir) =>
      rankSumAuc(Tables.embeddings(spark, sfDir)
        .select(
          element_at(col("embedding"), 1).as("score"),
          when(col("label") === 0, 1L).otherwise(0L).as("pos"))),
    Some(s"""
      WITH e AS (
        SELECT embedding[1] AS score,
               CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
        FROM embeddings),
      g AS (SELECT score, count(*) AS n, sum(pos) AS p FROM e GROUP BY 1),
      r AS (
        SELECT p, n,
               coalesce(sum(n) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM g),
      a AS (
        SELECT CAST(sum(p * (2 * cum + n + 1)) AS BIGINT) AS s2,
               CAST(sum(p) AS BIGINT) AS n_pos,
               CAST(sum(n - p) AS BIGINT) AS n_neg
        FROM r)
      SELECT n_pos, n_neg,
             ${Ql.R("CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE) / (2.0 * n_pos * n_neg)", 6)} AS auc
      FROM a
    """))

  /** Gini concentration of per-customer revenue via the sorted-index
    * closed form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n. Revenues are
    * cent-rounded BEFORE ranking so the sort key is the identical double
    * in both engines; the index is a row_number with a key tiebreak
    * (equal-x swaps cannot change Σ i·xᵢ, but the determinism keeps the
    * plans honest). One aggregation + one ordinal window over the
    * already-aggregated per-customer table.
    */
  private val gini = QueryDef(
    "q_gini",
    (spark, sfDir) => {
      val rev = Tables.orders(spark, sfDir)
        .groupBy("o_custkey")
        .agg(Ql.r(sum(col("o_totalprice")), 2).as("x"))
      val w = Window.orderBy(col("x"), col("o_custkey"))
      rev.withColumn("i", row_number().over(w).cast("long"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("x")).as("sx"),
          sum(col("i").cast("double") * col("x")).as("six"))
        .select(
          col("n_customers"),
          Ql.r(col("sx"), 2).as("total_revenue"),
          Ql.r(lit(2.0) * col("six") / (col("n_customers") * col("sx"))
            - (col("n_customers") + lit(1L)).cast("double") / col("n_customers"), 6)
            .as("gini"))
    },
    Some(s"""
      WITH rev AS (
        SELECT o_custkey, ${Ql.R("sum(o_totalprice)", 2)} AS x
        FROM orders GROUP BY 1),
      idx AS (
        SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
        FROM rev),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
               sum(x) AS sx,
               sum(CAST(i AS DOUBLE) * x) AS six
        FROM idx)
      SELECT n_customers, ${Ql.R("sx", 2)} AS total_revenue,
             ${Ql.R("2.0 * six / (n_customers * sx) - CAST(n_customers + 1 AS DOUBLE) / n_customers", 6)} AS gini
      FROM a
    """))

  /** NDCG@10 of a price-ranked order list against priority-graded
    * relevance (URGENT→gain 3, HIGH→1, else 0), averaged per market
    * segment. The rank discount 1/log2(i+1) is materialized as a 10-entry
    * literal table generated ONCE in Scala and spliced into BOTH engines'
    * expressions — shortest-round-trip decimal strings parse to the
    * identical double everywhere, so no libm log enters either plan.
    * Ideal ranking re-ranks the same per-customer set by gain; both
    * rankings are two window row_numbers in one partition pass.
    */
  private val ndcg = QueryDef(
    "q_ndcg",
    (spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          when(col("o_orderpriority") === "1-URGENT", 3.0)
            .when(col("o_orderpriority") === "2-HIGH", 1.0)
            .otherwise(0.0).as("g"))
      val byPrice = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byGain = Window.partitionBy("o_custkey")
        .orderBy(col("g").desc, col("o_orderkey"))
      def disc(rn: Column): Column =
        discounts.foldLeft(lit(0.0)) { case (acc, (i, v)) =>
          when(rn === i, lit(v)).otherwise(acc)
        }
      val per = o
        .withColumn("rp", row_number().over(byPrice))
        .withColumn("rr", row_number().over(byGain))
        .groupBy("o_custkey")
        .agg(
          sum(col("g") * disc(col("rp"))).as("dcg"),
          sum(col("g") * disc(col("rr"))).as("idcg"))
        .filter(col("idcg") > 0)
        .select(col("o_custkey"), Ql.r(col("dcg") / col("idcg"), 6).as("ndcg"))
      per.join(Tables.customer(spark, sfDir)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), Ql.r(avg(col("ndcg")), 4).as("avg_ndcg"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      WITH o AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CASE o_orderpriority WHEN '1-URGENT' THEN 3.0
                                    WHEN '2-HIGH' THEN 1.0
                                    ELSE 0.0 END AS g
        FROM orders),
      r AS (
        SELECT o_custkey, g,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rp,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY g DESC, o_orderkey) AS rr
        FROM o),
      d AS (
        SELECT o_custkey,
               sum(g * ${discSql("rp")}) AS dcg,
               sum(g * ${discSql("rr")}) AS idcg
        FROM r GROUP BY 1),
      n AS (
        SELECT o_custkey, ${Ql.R("dcg / idcg", 6)} AS ndcg
        FROM d WHERE idcg > 0)
      SELECT c_mktsegment, count(*) AS n_customers,
             ${Ql.R("avg(ndcg)", 4)} AS avg_ndcg
      FROM n JOIN customer ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY 1
    """))

  /** Position → 1/log2(i+1), i = 1..10, as shortest-round-trip decimal
    * strings (Double.toString) shared verbatim by both engines.
    */
  private lazy val discounts: Seq[(Int, Double)] =
    (1 to 10).map(i => i -> 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  private def discSql(rnCol: String): String =
    discounts.map { case (i, v) => s"WHEN $rnCol = $i THEN $v" }
      .mkString("CASE ", " ", " ELSE 0.0 END")

  /** Winsorized (5%/95%-clamped) per-segment account-balance stats — the
    * robust-mean preprocessing step of any feature pipeline. The exact
    * interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `percentile_cont`, same (n−1)·q index — proven by q_agg_percentile)
    * come from a 5-row aggregate broadcast back onto the scan; strict
    * compares against the cutoffs are safe because c_acctbal is
    * cent-granular while a non-integral interpolation index lands strictly
    * between cent values.
    */
  private val winsorize = QueryDef(
    "q_winsorize",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
        .select(col("c_mktsegment"), col("c_acctbal"))
      val pct = c.groupBy("c_mktsegment").agg(
        expr("percentile(c_acctbal, 0.05)").as("p05"),
        expr("percentile(c_acctbal, 0.95)").as("p95"))
      c.join(broadcast(pct), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("c_acctbal") < col("p05"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("c_acctbal") > col("p95"), 1L).otherwise(0L)).as("n_high"),
          Ql.r(first(col("p05")), 4).as("p05_r"),
          Ql.r(first(col("p95")), 4).as("p95_r"),
          Ql.r(avg(greatest(least(col("c_acctbal"), col("p95")), col("p05"))), 4)
            .as("win_mean"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      WITH pct AS (
        SELECT c_mktsegment,
               percentile_cont(0.05) WITHIN GROUP (ORDER BY c_acctbal) AS p05,
               percentile_cont(0.95) WITHIN GROUP (ORDER BY c_acctbal) AS p95
        FROM customer GROUP BY 1)
      SELECT c.c_mktsegment,
             count(*) AS n,
             CAST(sum(CASE WHEN c_acctbal < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             CAST(sum(CASE WHEN c_acctbal > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             ${Ql.R("any_value(p05)", 4)} AS p05_r,
             ${Ql.R("any_value(p95)", 4)} AS p95_r,
             ${Ql.R("avg(greatest(least(c_acctbal, p95), p05))", 4)} AS win_mean
      FROM customer c JOIN pct ON c.c_mktsegment = pct.c_mktsegment
      GROUP BY 1 ORDER BY 1
    """))

  /** Mean reciprocal rank of the first URGENT order in each customer's
    * price-descending ranking — the retrieval twin of q_ndcg with the
    * harsher first-hit metric. 1/rank is an exact IEEE division of
    * identical operands on both engines; only the final averages round.
    */
  private val mrr = QueryDef(
    "q_mrr",
    (spark, sfDir) => {
      val byPrice = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val firstHit = Tables.orders(spark, sfDir)
        .withColumn("rp", row_number().over(byPrice))
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_custkey")
        .agg(min(col("rp")).as("first_rank"))
      firstHit.join(Tables.customer(spark, sfDir)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          Ql.r(avg(lit(1.0) / col("first_rank")), 4).as("mrr"),
          Ql.r(avg(col("first_rank").cast("double")), 4).as("avg_first_rank"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      WITH r AS (
        SELECT o_custkey, o_orderpriority,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rp
        FROM orders),
      f AS (
        SELECT o_custkey, min(rp) AS first_rank
        FROM r WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
      SELECT c_mktsegment, count(*) AS n_customers,
             ${Ql.R("avg(1.0 / first_rank)", 4)} AS mrr,
             ${Ql.R("avg(CAST(first_rank AS DOUBLE))", 4)} AS avg_first_rank
      FROM f JOIN customer ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY 1
    """))

  /** Calibration / reliability bins: 10 equi-width buckets over the score
    * range, each reporting observed positive rate vs mean score. The
    * data-dependent bounds are a 1-row aggregate broadcast back onto the
    * scan (never collected to the driver); the bucket index is a scalar
    * IEEE expression over identical operands, so it cannot diverge
    * between engines.
    */
  private val calibrationBins = QueryDef(
    "q_calibration_bins",
    (spark, sfDir) => {
      val e = Tables.embeddings(spark, sfDir)
        .select(
          element_at(col("embedding"), 1).cast("double").as("score"),
          when(col("label") === 0, 1L).otherwise(0L).as("pos"))
      val bounds = e.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
      e.join(broadcast(bounds))
        .withColumn("bin",
          least(floor((col("score") - col("lo")) * lit(10.0)
            / (col("hi") - col("lo"))), lit(9.0)).cast("long"))
        .groupBy("bin")
        .agg(
          count(lit(1)).as("n"),
          Ql.r(avg(col("score")), 4).as("mean_score"),
          Ql.r(avg(col("pos").cast("double")), 4).as("frac_pos"))
        .orderBy("bin")
    },
    Some(s"""
      WITH e AS (
        SELECT CAST(embedding[1] AS DOUBLE) AS score,
               CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
        FROM embeddings),
      b AS (SELECT min(score) AS lo, max(score) AS hi FROM e)
      SELECT CAST(least(floor((score - lo) * 10.0 / (hi - lo)), 9.0) AS BIGINT) AS bin,
             count(*) AS n,
             ${Ql.R("avg(score)", 4)} AS mean_score,
             ${Ql.R("avg(CAST(pos AS DOUBLE))", 4)} AS frac_pos
      FROM e, b
      GROUP BY 1 ORDER BY 1
    """))

  /** Reciprocal-rank fusion (Cormack et al. 2009, public) of two part
    * rankings — units sold vs revenue — into one top-20: score =
    * Σ 1/(60+rankᵢ). The fusion arithmetic is two exact IEEE divisions
    * and one addition over integer ranks, so only the pre-rank sort
    * keys need the cent-rounding contract. Ranks come from windows over
    * the per-part AGGREGATE (20k rows at sf0.1 — bounded by the part
    * catalog, not lineitem; at 100 TB the q_global_ordinals two-level
    * rank swaps in). Top-20 via TakeOrderedAndProject on the rounded
    * fused score with a key tiebreak.
    */
  private val rrfFusion = QueryDef(
    "q_rrf_fusion",
    (spark, sfDir) => {
      val s = Tables.lineitem(spark, sfDir)
        .groupBy("l_partkey")
        .agg(
          Ql.r(sum(col("l_quantity")), 2).as("qty"),
          Ql.r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("rev"))
      val byQty = Window.orderBy(col("qty").desc, col("l_partkey"))
      val byRev = Window.orderBy(col("rev").desc, col("l_partkey"))
      s.withColumn("qty_rank", row_number().over(byQty).cast("long"))
        .withColumn("rev_rank", row_number().over(byRev).cast("long"))
        .select(col("l_partkey"), col("qty_rank"), col("rev_rank"),
          Ql.r(lit(1.0) / (lit(60L) + col("qty_rank"))
            + lit(1.0) / (lit(60L) + col("rev_rank")), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("l_partkey"))
        .limit(20)
    },
    Some(s"""
      WITH s AS (
        SELECT l_partkey,
               ${Ql.R("sum(l_quantity)", 2)} AS qty,
               ${Ql.R("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS rev
        FROM lineitem GROUP BY 1),
      r AS (
        SELECT l_partkey,
               CAST(row_number() OVER (ORDER BY qty DESC, l_partkey) AS BIGINT) AS qty_rank,
               CAST(row_number() OVER (ORDER BY rev DESC, l_partkey) AS BIGINT) AS rev_rank
        FROM s)
      SELECT l_partkey, qty_rank, rev_rank,
             ${Ql.R("1.0 / (60 + qty_rank) + 1.0 / (60 + rev_rank)", 6)} AS rrf
      FROM r ORDER BY rrf DESC, l_partkey LIMIT 20
    """))

  override def defs: Seq[QueryDef] =
    Seq(auc, gini, ndcg, winsorize, mrr, calibrationBins, rrfFusion)
}
