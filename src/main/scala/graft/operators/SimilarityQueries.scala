package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY §2.I3/I4).
  * Embeddings are L2-normalized, so cosine ≡ dot product — the queries use
  * the raw dot as the score (the 100 TB fast path: one fused fold per pair,
  * no sqrt). Brute force is the correctness baseline; the IVF variant is
  * the scale path (probe a cluster subset, search only those partitions).
  */
object SimilarityQueries extends QueryModule {

  /** Per-label mean centroid (deterministic stand-in for trained k-means)
    * — the coarse quantizer shared by q_ann_ivf, q_semantic_dedup, and
    * q_ann_ivfpq. Components come from avg() (partitioning-dependent sum
    * order), which is why every consumer ranks on ROUNDED scores.
    */
  private def labelCentroids(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("label"), posexplode(col("v")))
      .groupBy("label", "pos")
      .agg(avg(col("col")).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("centroid"))

  /** 4×16-dim subspace decomposition + the vec_id<4 codebook — the PQ
    * building blocks shared by q_pq_codes and q_ann_ivfpq. One
    * definition so the codebook construction cannot drift between the
    * code builder and the composed IVF-PQ stack.
    */
  private[graft] def subspaces(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("vec_id"), col("label"), explode(expr("sequence(0, 3)")).as("j"), col("v"))
      .select(col("vec_id"), col("label"), col("j"), expr("slice(v, 16 * j + 1, 16)").as("s"))

  private def pqCodebook(subs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    subs.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cid"), col("j"), col("s").as("c"))

  /** Nearest-codeword assignment per (vec, subspace): argmin on the
    * ROUNDED squared distance with centroid-id tiebreak (project
    * rounding contract). Keeps the raw distance column for quantization
    * error reporting.
    */
  private def pqAssign(subs: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id", "j").orderBy(col("dr"), col("cid"))
    subs.join(broadcast(cb), "j")
      .withColumn("d",
        Vectors.dot(col("s"), col("s"))
          - lit(2.0) * Vectors.dot(col("s"), col("c"))
          + Vectors.dot(col("c"), col("c")))
      .withColumn("dr", Ql.r(col("d"), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("j"), col("cid"), col("d"))
  }

  /** I3: brute-force top-k — query vecs (vec_id<5) against all others.
    * Plan shape: broadcast the 5 queries against the candidate scan, then a
    * per-query top-k window (at scale: TakeOrdered per query key).
    */
  private val similarTopk = QueryDef(
    "q_similar_topk",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val cands = e.filter(col("vec_id") >= 5)
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
      cands.crossJoin(broadcast(q))
        .withColumn("score", Ql.r(Vectors.dot(col("qv"), col("v")), 4))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("vec_id"), col("score"))
        .orderBy("qid", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT qid, vec_id, ${Ql.R("list_dot_product(qv, v)", 4)} AS score
        FROM q, e WHERE vec_id >= 5)
      SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS INT) AS rank,
             vec_id, score
      FROM scored
      QUALIFY rank <= 10
      ORDER BY qid, rank
    """))

  /** I4: kNN majority-vote classification — top-10 neighbors' labels,
    * majority wins (ties: smallest label).
    */
  private val knnVote = QueryDef(
    "q_knn_vote",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("true_label"), col("v").as("qv"))
      val cands = e.filter(col("vec_id") >= 20)
      val wTop = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
      val wVote = Window.partitionBy("qid").orderBy(col("votes").desc, col("label"))
      cands.crossJoin(broadcast(q))
        // rank on the ROUNDED score (like q_similar_topk): the top-k cut
        // must not depend on sub-1e-9 cross-engine accumulation differences
        .withColumn("score", Ql.r(Vectors.dot(col("qv"), col("v")), 4))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 10)
        .groupBy("qid", "true_label", "label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("vrank", row_number().over(wVote))
        .filter(col("vrank") === 1)
        .select(col("qid"), col("true_label"), col("label").as("pred_label"), col("votes"))
        .orderBy("qid")
    },
    Some("""
      WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, label AS true_label, v AS qv FROM e WHERE vec_id < 20),
      top AS (
        SELECT qid, true_label, label,
               round(list_dot_product(qv, v) + 1e-9, 4) AS score, vec_id
        FROM q, e WHERE vec_id >= 20
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) <= 10),
      votes AS (SELECT qid, true_label, label, count(*) AS votes
                FROM top GROUP BY 1, 2, 3)
      SELECT qid, true_label, label AS pred_label, votes
      FROM votes
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) = 1
      ORDER BY qid
    """))

  /** I3-at-scale: IVF-style ANN. Coarse quantizer = per-label centroid
    * (mean vector — a deterministic stand-in for trained k-means); a query
    * probes its nprobe=2 nearest centroids and searches only those
    * clusters. At 100 TB the cluster id is the partition key, so a probe
    * touches 2/K of the data.
    */
  private val annIvf = QueryDef(
    "q_ann_ivf",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val centroids = labelCentroids(e)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val wProbe = Window.partitionBy("qid").orderBy(col("cscore").desc, col("label"))
      val probed = q.crossJoin(broadcast(centroids))
        // centroid components come from avg() (partitioning-dependent sum
        // order) — rank on the rounded score per the rounding contract
        .withColumn("cscore", Ql.r(Vectors.dot(col("qv"), col("centroid")), 6))
        .withColumn("crank", row_number().over(wProbe))
        .filter(col("crank") <= 2)
        .select(col("qid"), col("qv"), col("label"))
      val wTop = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
      probed.join(e.filter(col("vec_id") >= 5), "label")
        .withColumn("score", Ql.r(Vectors.dot(col("qv"), col("v")), 4))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("label"), col("score"))
        .orderBy("qid", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      cent AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, g.i AS pos, avg(v[g.i]) AS c
              FROM e, generate_series(1, 64) g(i)
              GROUP BY 1, 2)
        GROUP BY label),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      probed AS (
        SELECT qid, qv, label
        FROM q, cent
        QUALIFY row_number() OVER (PARTITION BY qid
          ORDER BY round(list_dot_product(qv, centroid) + 1e-9, 6) DESC, label) <= 2),
      scored AS (
        SELECT qid, e.vec_id, e.label, ${Ql.R("list_dot_product(qv, e.v)", 4)} AS score
        FROM probed JOIN e ON probed.label = e.label AND e.vec_id >= 5)
      SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS INT) AS rank,
             vec_id, label, score
      FROM scored
      QUALIFY rank <= 5
      ORDER BY qid, rank
    """))

  /** ANN tuning curve: recall@10 and scan cost of the IVF probe as a
    * function of nprobe ∈ {1, 2, 4, 8} — the knob an ANN owner actually
    * turns, measured against the exact brute-force top-10 on the same
    * rounded-score contract. Candidates are scored ONCE per (query,
    * probed cluster) at the deepest tier; the nprobe tiers are crank
    * thresholds over that checkpointed list, so the sweep costs one
    * probe pass regardless of grid size. Reports per nprobe: total and
    * per-query candidates scanned (the cost axis) and mean recall@10
    * (the quality axis) — diminishing returns appear as recall
    * flattening while scans keep doubling. Scale shape: everything
    * downstream of the one cluster-probe join is
    * candidate-list-sized; the brute-force truth side is the
    * q_ann_recall harness (fine for a 20-query probe set; the
    * production path IS the thing being tuned).
    */
  private val annNprobeSweep = QueryDef(
    "q_ann_nprobe_sweep",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val centroids = labelCentroids(e)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val base = e.filter(col("vec_id") >= 20)
      val wTop = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
      val truth = base.crossJoin(broadcast(q))
        .withColumn("score", Ql.r(Vectors.dot(col("qv"), col("v")), 4))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("vec_id"))
        .localCheckpoint(true) // 20 queries x 10 rows
      val wProbe = Window.partitionBy("qid").orderBy(col("cscore").desc, col("label"))
      val probed = q.crossJoin(broadcast(centroids))
        .withColumn("cscore", Ql.r(Vectors.dot(col("qv"), col("centroid")), 6))
        .withColumn("crank", row_number().over(wProbe))
        .filter(col("crank") <= 8)
        .select(col("qid"), col("qv"), col("label"), col("crank"))
      val scored = probed.join(base, "label")
        .withColumn("score", Ql.r(Vectors.dot(col("qv"), col("v")), 4))
        .select("qid", "crank", "vec_id", "score")
        .localCheckpoint(true) // candidate lists; the dot products run once
      val np = spark.range(0, 4)
        .select(expr("shiftleft(1, CAST(id AS INT))").as("nprobe"))
      val tiered = scored.join(broadcast(np), col("crank") <= col("nprobe"))
      val wIvf = Window.partitionBy("qid", "nprobe").orderBy(col("score").desc, col("vec_id"))
      val hits = tiered
        .withColumn("rank", row_number().over(wIvf))
        .filter(col("rank") <= 10)
        .join(truth, Seq("qid", "vec_id"), "left_semi")
        .groupBy("nprobe").agg(count(lit(1)).as("n_hits"))
      val scans = tiered.groupBy("nprobe").agg(count(lit(1)).as("n_scanned"))
      val nq = truth.agg(countDistinct(col("qid")).as("n_q"))
      scans.join(hits, Seq("nprobe"), "left").na.fill(0L, Seq("n_hits"))
        .crossJoin(broadcast(nq))
        .selectExpr("nprobe", "n_scanned",
          s"${Ql.R("n_scanned / CAST(n_q AS DOUBLE)", 2)} AS avg_scanned",
          s"${Ql.R("n_hits / (10.0 * n_q)", 4)} AS recall_at_10")
        .orderBy("nprobe")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      cent AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, g.i AS pos, avg(v[g.i]) AS c
              FROM e, generate_series(1, 64) g(i)
              GROUP BY 1, 2)
        GROUP BY label),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
      base AS (SELECT * FROM e WHERE vec_id >= 20),
      truth AS (
        SELECT qid, vec_id
        FROM (SELECT qid, base.vec_id, ${Ql.R("list_dot_product(qv, base.v)", 4)} AS score
              FROM q, base)
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) <= 10),
      probed AS (
        SELECT qid, qv, label, crank FROM (
          SELECT qid, qv, label,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY round(list_dot_product(qv, centroid) + 1e-9, 6) DESC, label) AS crank
          FROM q, cent)
        WHERE crank <= 8),
      scored AS (
        SELECT qid, crank, base.vec_id,
               ${Ql.R("list_dot_product(qv, base.v)", 4)} AS score
        FROM probed JOIN base ON probed.label = base.label),
      np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
      tiered AS (SELECT s.*, np.nprobe FROM scored s JOIN np ON s.crank <= np.nprobe),
      ivftop AS (
        SELECT qid, nprobe, vec_id FROM tiered
        QUALIFY row_number() OVER (PARTITION BY qid, nprobe ORDER BY score DESC, vec_id) <= 10),
      nq AS (SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_q FROM truth),
      hits AS (SELECT nprobe, count(*) AS n_hits
               FROM ivftop SEMI JOIN truth USING (qid, vec_id) GROUP BY 1),
      scans AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_scanned FROM tiered GROUP BY 1)
      SELECT s.nprobe, s.n_scanned,
             ${Ql.R("s.n_scanned / CAST(n_q AS DOUBLE)", 2)} AS avg_scanned,
             ${Ql.R("coalesce(h.n_hits, 0) / (10.0 * n_q)", 4)} AS recall_at_10
      FROM scans s LEFT JOIN hits h ON h.nprobe = s.nprobe CROSS JOIN nq
      ORDER BY 1
    """))

  /** I7: multimodal column join — attach embeddings to documents (partial
    * coverage at sf0.1 by design: left join, count misses).
    */
  private val docEmbedJoin = QueryDef(
    "q_doc_embed_join",
    (spark, sfDir) => {
      val d = Tables.documents(spark, sfDir)
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      d.join(e, d("doc_id") === e("vec_id"), "left")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          count(col("vec_id")).as("n_with_vec"),
          Ql.r(avg(Vectors.normSq(col("v"))), 4).as("avg_norm_sq"))
        .orderBy("lang")
    },
    Some(s"""
      SELECT lang, count(*) AS n_docs, count(vec_id) AS n_with_vec,
             ${Ql.R("avg(list_dot_product(v, v))", 4)} AS avg_norm_sq
      FROM documents LEFT JOIN
           (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings) ON doc_id = vec_id
      GROUP BY 1 ORDER BY 1
    """))

  /** I3-at-scale: int8 quantization — the memory/bandwidth lever for
    * billion-vector search (4 bytes -> 1 byte per dim). Deterministic
    * `floor(x·scale + 0.5)` rounding; outputs are integer-exact, and the
    * quantized self-dot's relative error vs the float norm is reported.
    */
  private val embedQuantize = QueryDef(
    "q_embed_quantize",
    (spark, sfDir) =>
      Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 50)
        .withColumn("v", Vectors.toDouble(col("embedding")))
        .withColumn("max_abs", expr("array_max(transform(v, x -> abs(x)))"))
        .withColumn("scale", lit(127.0) / col("max_abs"))
        .withColumn("q", expr(
          "transform(v, x -> CAST(floor(x * scale + 0.5d) AS INT))"))
        .select(
          col("vec_id"),
          Ql.r(col("scale")).as("scale_r"),
          expr("aggregate(q, 0, (acc, x) -> acc + x)").as("q_sum"),
          expr("aggregate(transform(q, x -> x * x), 0L, (acc, x) -> acc + CAST(x AS BIGINT))").as("q_norm_sq"),
          expr("array_max(transform(q, x -> abs(x)))").as("q_max_abs"))
        .orderBy("vec_id"),
    Some(s"""
      SELECT vec_id,
             ${Ql.R("scale")} AS scale_r,
             CAST(list_sum(q) AS INT) AS q_sum,
             CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS q_norm_sq,
             CAST(list_max(list_transform(q, x -> abs(x))) AS INT) AS q_max_abs
      FROM (
        SELECT vec_id, scale,
               list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INT)) AS q
        FROM (SELECT vec_id, v,
                     127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
              FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings))
        WHERE vec_id < 50)
      ORDER BY vec_id
    """))

  /** I4b: product quantization — the 64-dim vector splits into 4
    * subspaces of 16 dims; each subvector is assigned to its nearest of 4
    * per-subspace codebook centroids (subvectors of vec_id 0..3 — the
    * deterministic "first K" init; the trained-codebook path is q_kmeans'
    * Lloyd loop applied per subspace). The packed 8-bit code compresses
    * 256 B of floats to one byte per subspace — the standard ANN memory
    * trick (Jégou et al., PAMI'11, re-derived from the public algorithm).
    * Plan shape: one explode (×4), one 16-row broadcast, one window
    * argmin, one regroup — all keyed on vec_id, linear at any corpus
    * size. Argmin ranks on the ROUNDED distance (project contract, see
    * q_kmeans) with centroid-id tiebreak.
    */
  private val pqCodes = QueryDef(
    "q_pq_codes",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val subs = subspaces(e)
      pqAssign(subs, pqCodebook(subs))
        .groupBy("vec_id")
        .agg(
          sum(expr("cid * CASE j WHEN 0 THEN 64 WHEN 1 THEN 16 WHEN 2 THEN 4 ELSE 1 END"))
            .cast("long").as("code"),
          Ql.r(sum(col("d")), 4).as("qerr"))
        .orderBy("vec_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      subs AS (SELECT vec_id, g.j, v[16 * g.j + 1 : 16 * g.j + 16] AS s
               FROM e, generate_series(0, 3) g(j)),
      cb AS (SELECT CAST(vec_id AS INT) AS cid, j, s AS c
             FROM subs WHERE vec_id < 4),
      a AS (SELECT vec_id, j, cid, d FROM (
              SELECT s.vec_id, s.j, cb.cid,
                     list_dot_product(s.s, s.s) - 2 * list_dot_product(s.s, cb.c)
                       + list_dot_product(cb.c, cb.c) AS d,
                     row_number() OVER (PARTITION BY s.vec_id, s.j
                       ORDER BY round(list_dot_product(s.s, s.s)
                                - 2 * list_dot_product(s.s, cb.c)
                                + list_dot_product(cb.c, cb.c) + 1e-9, 6), cb.cid) AS rn
              FROM subs s JOIN cb ON s.j = cb.j) WHERE rn = 1)
      SELECT vec_id,
             CAST(sum(cid * CASE j WHEN 0 THEN 64 WHEN 1 THEN 16 WHEN 2 THEN 4 ELSE 1 END) AS BIGINT) AS code,
             ${Ql.R("sum(d)", 4)} AS qerr
      FROM a GROUP BY 1 ORDER BY 1
    """))

  /** I2-semantic: SemDeDup-style semantic deduplication (Abbas et al.
    * 2023, public; re-derived here): partition the embedding space into
    * clusters, compare pairs ONLY within a cluster, and drop every vector
    * that has a lower-id near-twin (cosine >= 0.9). The whole point of
    * the method is that the O(n²) pair comparison becomes
    * O(Σ cluster_size²) — at corpus scale K grows with N so per-cluster
    * population stays bounded, and the cluster id is the join/partition
    * key, so each pair task touches one cluster's rows only.
    *
    * The coarse quantizer is the per-label centroid (the same
    * deterministic trained-k-means stand-in as q_ann_ivf — full Lloyd
    * lives in q_kmeans; at scale you'd chain them). Assignment is one
    * broadcast pass (10 centroid rows against the scan). Per-cluster
    * kept/dropped counts are the report.
    */
  /** The SemDeDup scaffold (Abbas et al. 2023, public): the
    * plants-augmented embedding table (vec_id<10 copied to id+100000,
    * last component +0.1, cosine ≈ 0.995 — the natural pairwise maximum
    * in this corpus is ~0.51, so without plants the drop path would be
    * vacuously untested) and its centroid-bucketed assignment, shared by
    * q_semantic_dedup and q_semdedup_eps_sweep so the measured bucketing
    * is the served one. Returns (e, assigned, centroids); `e` is cached
    * and the caller unpersists it after materializing its report. The
    * centroid frame is returned so consumers that need it
    * (q_proto_pruning's prototypicality) score against the SAME avg()
    * instance the assignment used — a recomputed centroid could differ
    * by an ulp (partitioning-dependent sum order) and flip a rounding
    * boundary.
    */
  private def semAssigned(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e0 = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
    val e = e0.unionByName(
      e0.filter(col("vec_id") < 10).select(
        (col("vec_id") + 100000).as("vec_id"), col("label"),
        expr("concat(slice(v, 1, 63), array(element_at(v, 64) + 0.1d))").as("v")))
      .cache()
    val centroids = labelCentroids(e)
      .select(col("label").as("cl"), col("centroid"))
      // K rows, materialized ONCE so the assignment and any downstream
      // centroid consumer read the same avg() realization
      .localCheckpoint(true)
    // rank on the ROUNDED score (rounding contract): centroid components
    // come from avg() whose summation order is partitioning-dependent
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cscore").desc, col("cl"))
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("cscore", Ql.r(Vectors.dot(col("v"), col("centroid")), 6))
      .withColumn("arank", row_number().over(wAssign))
      .filter(col("arank") === 1)
      .select(col("cl").as("cluster"), col("vec_id"), col("v"),
        sqrt(Vectors.normSq(col("v"))).as("norm"))
    (e, assigned, centroids)
  }

  /** Oracle twin of [[semAssigned]]: CTE chain ending in
    * `assigned(cluster, vec_id, v, norm)`.
    */
  private val semAssignedSql =
    """e0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
      e AS (
        SELECT * FROM e0
        UNION ALL
        SELECT vec_id + 100000, label, v[1:63] || [v[64] + 0.1] FROM e0 WHERE vec_id < 10),
      cent AS (
        SELECT label AS cl, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, g.i AS pos, avg(v[g.i]) AS c
              FROM e, generate_series(1, 64) g(i)
              GROUP BY 1, 2)
        GROUP BY 1),
      assigned AS (
        SELECT cl AS cluster, vec_id, v, sqrt(list_dot_product(v, v)) AS norm
        FROM e, cent
        QUALIFY row_number() OVER (PARTITION BY vec_id
          ORDER BY round(list_dot_product(v, centroid) + 1e-9, 6) DESC, cl) = 1)"""

  private val semanticDedup = QueryDef(
    "q_semantic_dedup",
    (spark, sfDir) => {
      val (e, assigned, _) = semAssigned(spark, sfDir)
      val dropped = assigned
        .select(col("cluster"), col("vec_id").as("d1"), col("v").as("v1"), col("norm").as("n1"))
        .join(assigned
          .select(col("cluster"), col("vec_id").as("d2"), col("v").as("v2"), col("norm").as("n2")),
          "cluster")
        .filter(col("d1") < col("d2"))
        .filter(Ql.r(Vectors.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4) >= 0.9)
        .select(col("cluster"), col("d2")).distinct()
        .groupBy("cluster").agg(count(lit(1)).as("n_dropped"))
      val report = assigned.groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
        .join(dropped, Seq("cluster"), "left")
        .select(col("cluster"), col("n_vecs"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
        .orderBy("cluster")
        // K-row report — materialize so the planted-union cache's scope
        // is this function, not the rest of the session
        .localCheckpoint(true)
      e.unpersist(false)
      report
    },
    Some(s"""
      WITH $semAssignedSql,
      dropped AS (
        SELECT cluster, count(*) AS n_dropped FROM (
          SELECT DISTINCT a.cluster, b.vec_id AS d2
          FROM assigned a JOIN assigned b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm) + 1e-9, 4) >= 0.9)
        GROUP BY 1)
      SELECT a.cluster, count(*) AS n_vecs,
             CAST(coalesce(any_value(d.n_dropped), 0) AS BIGINT) AS n_dropped,
             CAST(count(*) - coalesce(any_value(d.n_dropped), 0) AS BIGINT) AS n_kept
      FROM assigned a LEFT JOIN dropped d ON a.cluster = d.cluster
      GROUP BY 1 ORDER BY 1
    """))

  /** SemDeDup THRESHOLD sweep — the knob curve a semantic-dedup owner
    * reads before picking ε: keep/drop volume at ε ∈ {0.30, 0.40, 0.85,
    * 0.99} — the low tiers sit in this corpus's natural random-pair
    * cosine range (max ≈ 0.51) and the high tiers in the production
    * SemDeDup near-dup range, so the curve shows both shoulders — from
    * ONE pair pass over the served centroid-bucketed
    * scaffold ([[semAssigned]], shared with q_semantic_dedup). The drop
    * rule per ε is q_semantic_dedup's exactly: a vector drops iff some
    * LOWER-id same-cluster partner has rounded cosine ≥ ε — so per doc
    * the sweep needs only its MAX such cosine, and the four tiers are
    * conditional counts over that per-doc table (the
    * q_quantile_regression one-pass-many-thresholds shape: no per-ε
    * re-scan, no theta join). ε thresholds are exponent-notation
    * literals (fact #39) compared against the 4-dp-rounded max, so the
    * tier cuts are bit-identical cross-engine.
    */
  private val semdedupEpsSweep = QueryDef(
    "q_semdedup_eps_sweep",
    (spark, sfDir) => {
      val (e, assigned, _) = semAssigned(spark, sfDir)
      val md = assigned
        .select(col("cluster"), col("vec_id").as("d1"), col("v").as("v1"), col("norm").as("n1"))
        .join(assigned
          .select(col("cluster"), col("vec_id").as("d2"), col("v").as("v2"), col("norm").as("n2")),
          "cluster")
        .filter(col("d1") < col("d2"))
        .select(col("d2"),
          Ql.r(Vectors.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4).as("cr"))
        .groupBy("d2").agg(max(col("cr")).as("max_cos"))
        .localCheckpoint(true) // per-doc table; the pair pass runs once
      val tot = assigned.agg(count(lit(1)).as("n_total"))
        .localCheckpoint(true) // 1 row, materialized before the cache drops
      e.unpersist(false)
      md.agg(
          count(when(col("max_cos") >= expr("30e-2"), 1)).as("c30"),
          count(when(col("max_cos") >= expr("40e-2"), 1)).as("c40"),
          count(when(col("max_cos") >= expr("85e-2"), 1)).as("c85"),
          count(when(col("max_cos") >= expr("99e-2"), 1)).as("c99"))
        .crossJoin(broadcast(tot))
        .selectExpr("n_total",
          "stack(4, '0.30', c30, '0.40', c40, '0.85', c85, '0.99', c99) AS (eps, n_dropped)")
        .selectExpr("eps", "n_total", "n_dropped",
          "n_total - n_dropped AS n_kept",
          s"${Ql.R("100.0 * n_dropped / n_total", 4)} AS drop_pct")
        .orderBy("eps")
    },
    Some(s"""
      WITH $semAssignedSql,
      md AS (
        SELECT b.vec_id AS d2,
               max(round(list_dot_product(a.v, b.v) / (a.norm * b.norm) + 1e-9, 4)) AS max_cos
        FROM assigned a JOIN assigned b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM assigned),
      cnt AS (SELECT
          count(*) FILTER (WHERE max_cos >= 30e-2) AS c30,
          count(*) FILTER (WHERE max_cos >= 40e-2) AS c40,
          count(*) FILTER (WHERE max_cos >= 85e-2) AS c85,
          count(*) FILTER (WHERE max_cos >= 99e-2) AS c99
        FROM md),
      s AS (SELECT '0.30' AS eps, c30 AS n_dropped FROM cnt
            UNION ALL SELECT '0.40', c40 FROM cnt
            UNION ALL SELECT '0.85', c85 FROM cnt
            UNION ALL SELECT '0.99', c99 FROM cnt)
      SELECT eps, n_total, n_dropped, n_total - n_dropped AS n_kept,
             ${Ql.R("100.0 * n_dropped / n_total", 4)} AS drop_pct
      FROM s CROSS JOIN tot ORDER BY eps
    """))

  /** I3-ivfpq: the full production ANN stack — IVF coarse quantizer +
    * product-quantization asymmetric distance (ADC; Jégou et al. PAMI'11,
    * re-derived). A query (a) probes its nprobe=2 nearest coarse
    * centroids, restricting the search to 2/K of the corpus, then (b)
    * scores ONLY PQ codes inside those lists: approx ‖q−x‖² =
    * Σⱼ ‖qⱼ − c_{code(x,j)}‖², read from a per-query lookup table of
    * nq × 4 subspaces × 4 codewords = 80 rows, broadcast. The scoring
    * loop never touches a full vector — per-vector memory is the 1-byte-
    * per-subspace code, the 64× compression that makes billion-vector
    * indexes fit in RAM. Every argmin/rank is on the ROUNDED distance
    * with id tiebreaks (project rounding contract), so the DuckDB twin
    * hash-matches the whole pipeline: codebook assignment, probe set,
    * ADC scores, final ranking.
    */
  /** The IVF-PQ retrieval pipeline (probe → ADC → per-query top-k),
    * shared by q_ann_ivfpq (the ranked result surface, k=5) and
    * q_ann_recall (the quality metric, k=10) — one definition so the
    * measured stack IS the served stack.
    */
  private def ivfPqTopK(e: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // coarse quantizer: per-label mean centroid (as q_ann_ivf)
    val centroids = labelCentroids(e)
    // PQ codebook + database-side encoding (shared helpers — the same
    // construction as q_pq_codes, by definition not just by claim)
    val subs = subspaces(e)
    val cb = pqCodebook(subs)
    val encoded = pqAssign(subs.filter(col("vec_id") >= 5), cb)
      .select(col("vec_id"), col("label"), col("j"), col("cid"))
    // query side: probe 2 coarse lists, build the 80-row ADC table
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wProbe = Window.partitionBy("qid").orderBy(col("cscore").desc, col("label"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cscore", Ql.r(Vectors.dot(col("qv"), col("centroid")), 6))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= 2)
      .select(col("qid"), col("label"))
    val lut = q
      .select(col("qid"), explode(expr("sequence(0, 3)")).as("j"), col("qv"))
      .select(col("qid"), col("j"), expr("slice(qv, 16 * j + 1, 16)").as("qs"))
      .join(broadcast(cb), "j")
      .select(col("qid"), col("j"), col("cid"),
        (Vectors.dot(col("qs"), col("qs"))
          - lit(2.0) * Vectors.dot(col("qs"), col("c"))
          + Vectors.dot(col("c"), col("c"))).as("d"))
    // ADC: sum the 4 table cells per (query, candidate) — candidates
    // only from probed lists
    val wTop = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    probed.join(encoded, "label")
      .join(broadcast(lut), Seq("qid", "j", "cid"))
      .groupBy("qid", "vec_id")
      .agg(Ql.r(sum(col("d")), 4).as("adist"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("adist"))
  }

  /** Oracle twin of [[ivfPqTopK]]'s pipeline through the ADC scores —
    * the CTE chain (e → cent → subs → cb → encoded → q → probed → lut →
    * adc) shared by the q_ann_ivfpq and q_ann_recall oracles, so the
    * measured stack and the served stack cannot drift on the SQL side
    * either.
    */
  private val ivfPqCtesSql = s"""e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      cent AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, g.i AS pos, avg(v[g.i]) AS c
              FROM e, generate_series(1, 64) g(i)
              GROUP BY 1, 2)
        GROUP BY label),
      subs AS (SELECT vec_id, label, g.j, v[16 * g.j + 1 : 16 * g.j + 16] AS s
               FROM e, generate_series(0, 3) g(j)),
      cb AS (SELECT CAST(vec_id AS INT) AS cid, j, s AS c
             FROM subs WHERE vec_id < 4),
      encoded AS (
        SELECT vec_id, label, j, cid FROM (
          SELECT s.vec_id, s.label, s.j, cb.cid,
                 row_number() OVER (PARTITION BY s.vec_id, s.j
                   ORDER BY round(list_dot_product(s.s, s.s)
                            - 2 * list_dot_product(s.s, cb.c)
                            + list_dot_product(cb.c, cb.c) + 1e-9, 6), cb.cid) AS rn
          FROM subs s JOIN cb ON s.j = cb.j
          WHERE s.vec_id >= 5) WHERE rn = 1),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      probed AS (
        SELECT qid, label
        FROM q, cent
        QUALIFY row_number() OVER (PARTITION BY qid
          ORDER BY round(list_dot_product(qv, centroid) + 1e-9, 6) DESC, label) <= 2),
      lut AS (
        SELECT sq.qid, sq.j, cb.cid,
               list_dot_product(sq.qs, sq.qs) - 2 * list_dot_product(sq.qs, cb.c)
                 + list_dot_product(cb.c, cb.c) AS d
        FROM (SELECT qid, g.j AS j, qv[16 * g.j + 1 : 16 * g.j + 16] AS qs
              FROM q, generate_series(0, 3) g(j)) sq
        JOIN cb ON cb.j = sq.j),
      adc AS (
        SELECT p.qid, en.vec_id, ${Ql.R("sum(l.d)", 4)} AS adist
        FROM probed p
          JOIN encoded en ON en.label = p.label
          JOIN lut l ON l.qid = p.qid AND l.j = en.j AND l.cid = en.cid
        GROUP BY 1, 2)"""

  private val annIvfPq = QueryDef(
    "q_ann_ivfpq",
    (spark, sfDir) => {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      ivfPqTopK(e, 5).orderBy("qid", "rank")
    },
    Some(s"""
      WITH $ivfPqCtesSql
      SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS INT) AS rank,
             vec_id, adist
      FROM adc
      QUALIFY rank <= 5
      ORDER BY qid, rank
    """))

  /** I3-recall: the ANN stack's QUALITY metric — recall@10 of the IVF-PQ
    * pipeline against the brute-force exact top-10 on the same query
    * vectors. The stack's mechanics (probe set, codes, ADC scores,
    * ranking) are hash-matched by q_ann_ivfpq; this query measures what
    * those mechanics buy: how much of the true neighborhood the
    * 2-of-K-probe + 64×-compressed representation retains. Both sides
    * rank on the ROUNDED distance with vec_id tiebreaks, so the per-query
    * hit count — not just an aggregate score — is deterministic and
    * oracle-able. Expect LOW absolute recall on this synthetic corpus:
    * isotropic random embeddings have near-uniform pairwise distances
    * (concentration of measure), so the 4-codeword PQ's quantization
    * noise swamps the tiny true-neighbor margin — the metric's value
    * here is that it is measured at all (and would rise on clustered
    * real embeddings, which is exactly what it exists to detect).
    * Scale shape: the exact side is the declared
    * constant-size query broadcast against the corpus scan (the
    * q_similar_topk plan); the approx side is the shared [[ivfPqTopK]]
    * pipeline; the final recall join touches nq × 10 rows.
    */
  private val annRecall = QueryDef(
    "q_ann_recall",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val db = e.filter(col("vec_id") >= 5).select(col("vec_id"), col("v"))
      // exact ground truth: full squared L2 against every database vector
      val wX = Window.partitionBy("qid").orderBy(col("edist"), col("vec_id"))
      val exact = db.crossJoin(broadcast(q))
        .withColumn("edist", Ql.r(
          Vectors.dot(col("qv"), col("qv"))
            - lit(2.0) * Vectors.dot(col("qv"), col("v"))
            + Vectors.dot(col("v"), col("v")), 6))
        .withColumn("rn", row_number().over(wX))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id"))
      val approx = ivfPqTopK(e, 10).select(col("qid"), col("vec_id"), lit(1).as("hit"))
      exact.join(approx, Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(count(col("hit")).as("n_hit"))
        .withColumn("recall", Ql.r(col("n_hit") / lit(10.0), 4))
        .select(col("qid"), col("n_hit"), col("recall"))
        .orderBy("qid")
    },
    Some(s"""
      WITH $ivfPqCtesSql,
      approx AS (
        SELECT qid, vec_id FROM adc
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) <= 10),
      db AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
      exact AS (
        SELECT qid, vec_id FROM q, db
        QUALIFY row_number() OVER (PARTITION BY qid
          ORDER BY round(list_dot_product(qv, qv) - 2 * list_dot_product(qv, v)
                   + list_dot_product(v, v) + 1e-9, 6), vec_id) <= 10)
      SELECT ex.qid, count(a.vec_id) AS n_hit,
             ${Ql.R("count(a.vec_id) / 10.0", 4)} AS recall
      FROM exact ex LEFT JOIN approx a
        ON a.qid = ex.qid AND a.vec_id = ex.vec_id
      GROUP BY 1 ORDER BY 1
    """))

  /** Per-class embedding outlier audit: cosine of every vector to its
    * label centroid, reporting the class's cohesion (avg/min cosine) and
    * how many members point AWAY from their own centroid (cos < 0) — the
    * label-noise screen run before training on labeled embeddings.
    * Centroid components are avg'd then ROUNDED at 6 dp on both engines,
    * so the subsequent sequential-fold dot product is bit-identical
    * cross-engine (no unrounded-aggregate ulps reach the compare). The
    * 10-row centroid table broadcasts onto the scan via an equi join on
    * label — one shuffle for the centroids, zero for the scoring pass.
    */
  private val docOutlier = QueryDef(
    "q_doc_outlier",
    (spark, sfDir) => {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val cent = e.select(col("label"), posexplode(col("v")))
        .groupBy("label", "pos")
        .agg(Ql.r(avg(col("col")), 6).as("m"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
          .as("c"))
      e.join(broadcast(cent), "label")
        .withColumn("cos", Ql.r(Vectors.cosine(col("v"), col("c")), 4))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          Ql.r(avg(col("cos")), 4).as("avg_cos"),
          min(col("cos")).as("min_cos"),
          sum(when(col("cos") < 0, 1L).otherwise(0L)).as("n_neg"))
        .orderBy("label")
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      cent AS (
        SELECT label, list(m ORDER BY pos) AS c FROM (
          SELECT label, g.i AS pos, ${Ql.R("avg(v[g.i])", 6)} AS m
          FROM e, generate_series(1, 64) g(i) GROUP BY 1, 2)
        GROUP BY label),
      s AS (
        SELECT e.label,
               ${Ql.R(
      "list_dot_product(e.v, cent.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.c, cent.c)))",
      4)} AS cos
        FROM e JOIN cent USING (label))
      SELECT label, count(*) AS n,
             ${Ql.R("avg(cos)", 4)} AS avg_cos,
             min(cos) AS min_cos,
             CAST(sum(CASE WHEN cos < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM s GROUP BY 1 ORDER BY 1
    """))

  /** Simplified (centroid-based) silhouette of the labeled embedding
    * clustering (Rousseeuw 1987; the centroid variant trades the exact
    * all-pairs a(i)/b(i) for distances to the K centroids — THE
    * tractable form at corpus scale, O(nK) instead of O(n²)). Each
    * vector meets all K label centroids via one broadcast (K = label
    * vocabulary), cosine DISTANCE 1−cos gives a (own centroid) and b
    * (best other), s = (b−a)/max(a,b). The q_doc_outlier float
    * discipline: centroids rounded 6 dp, per-pair cosines rounded 4 dp
    * BEFORE the s arithmetic, so both engines compose identical
    * operands; a degenerate max(a,b)=0 yields s=0 by the same CASE.
    * Output: per label, mean silhouette, the misassignment count
    * (b < a — a vector nearer another centroid), and sizes.
    */
  private val silhouette = QueryDef(
    "q_silhouette",
    (spark, sfDir) => {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val cent = e.select(col("label"), posexplode(col("v")))
        .groupBy("label", "pos")
        .agg(Ql.r(avg(col("col")), 6).as("m"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
          .as("c"))
        .select(col("label").as("clabel"), col("c"))
      val scored = e.crossJoin(broadcast(cent))
        .withColumn("cos", Ql.r(Vectors.cosine(col("v"), col("c")), 4))
        .groupBy("vec_id", "label")
        .agg(
          max(when(col("clabel") === col("label"), col("cos"))).as("cos_own"),
          max(when(col("clabel") =!= col("label"), col("cos"))).as("cos_oth"))
        .selectExpr("vec_id", "label",
          "1.0 - cos_own AS a", "1.0 - cos_oth AS b")
        .selectExpr("vec_id", "label",
          """CASE WHEN greatest(a, b) = 0.0 THEN 0.0
                  ELSE (b - a) / greatest(a, b) END AS s""",
          "CASE WHEN b < a THEN 1 ELSE 0 END AS misassigned")
      scored.groupBy("label")
        .agg(count(lit(1)).as("n"),
          Ql.r(avg("s"), 4).as("mean_silhouette"),
          sum("misassigned").cast("long").as("n_misassigned"))
        .orderBy("label")
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      cent AS (
        SELECT label AS clabel, list(m ORDER BY pos) AS c FROM (
          SELECT label, g.i AS pos, ${Ql.R("avg(v[g.i])", 6)} AS m
          FROM e, generate_series(1, 64) g(i) GROUP BY 1, 2)
        GROUP BY label),
      pairs AS (
        SELECT vec_id, label, clabel,
               ${Ql.R(
      "list_dot_product(e.v, cent.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.c, cent.c)))",
      4)} AS cos
        FROM e CROSS JOIN cent),
      ab AS (
        SELECT vec_id, label,
               1.0 - max(CASE WHEN clabel = label THEN cos END) AS a,
               1.0 - max(CASE WHEN clabel <> label THEN cos END) AS b
        FROM pairs GROUP BY 1, 2),
      s AS (
        SELECT label,
               CASE WHEN greatest(a, b) = 0.0 THEN 0.0
                    ELSE (b - a) / greatest(a, b) END AS s,
               CASE WHEN b < a THEN 1 ELSE 0 END AS misassigned
        FROM ab)
      SELECT label, count(*) AS n,
             ${Ql.R("avg(s)", 4)} AS mean_silhouette,
             CAST(sum(misassigned) AS BIGINT) AS n_misassigned
      FROM s GROUP BY 1 ORDER BY 1
    """))

  /** Embedding-distribution drift as the linear-kernel maximum mean
    * discrepancy between the even- and odd-id halves of the corpus —
    * MMD² = ‖μ₀ − μ₁‖² (Gretton et al. 2012 with k(x,y)=x·y; the
    * version that needs only the two MEAN vectors, so the corpus cost
    * is one keyed average per dimension — no pairwise kernel matrix).
    * Per-dimension means are rounded at 6 dp before the squared-gap
    * sum (64 terms); reports MMD², the worst-drifting dimension's gap,
    * and both half sizes. The same query against time halves is the
    * production embedding-space drift alarm.
    */
  private val embeddingDrift = QueryDef(
    "q_embedding_drift",
    (spark, sfDir) => {
      val e = Tables.embeddings(spark, sfDir)
        .select((col("vec_id") % 2).cast("long").as("half"),
          posexplode(Vectors.toDouble(col("embedding"))))
      val means = e.groupBy("half", "pos")
        .agg(count(lit(1)).as("n"), Ql.r(avg(col("col")), 6).as("m"))
      means.groupBy("pos")
        .agg(
          max(when(col("half") === 0, col("m"))).as("m0"),
          max(when(col("half") === 1, col("m"))).as("m1"),
          max(when(col("half") === 0, col("n"))).as("n0"),
          max(when(col("half") === 1, col("n"))).as("n1"))
        .agg(
          max("n0").as("n_even"), max("n1").as("n_odd"),
          Ql.r(sum(expr("(m0 - m1) * (m0 - m1)")), 8).as("mmd_sq"),
          Ql.r(max(expr("abs(m0 - m1)")), 6).as("max_dim_gap"))
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id % 2 AS half, g.i AS pos,
               CAST(embedding[g.i] AS DOUBLE) AS x
        FROM embeddings, generate_series(1, 64) g(i)),
      means AS (
        SELECT half, pos, CAST(count(*) AS BIGINT) AS n,
               ${Ql.R("avg(x)", 6)} AS m
        FROM e GROUP BY 1, 2),
      d AS (
        SELECT pos,
               max(CASE WHEN half = 0 THEN m END) AS m0,
               max(CASE WHEN half = 1 THEN m END) AS m1,
               max(CASE WHEN half = 0 THEN n END) AS n0,
               max(CASE WHEN half = 1 THEN n END) AS n1
        FROM means GROUP BY 1)
      SELECT CAST(max(n0) AS BIGINT) AS n_even, CAST(max(n1) AS BIGINT) AS n_odd,
             ${Ql.R("sum((m0 - m1) * (m0 - m1))", 8)} AS mmd_sq,
             ${Ql.R("max(abs(m0 - m1))", 6)} AS max_dim_gap
    FROM d
    """))

  /** Mutual nearest-neighbor pair mining — the base form of
    * parallel-data discovery (bitext mining, caption–image pairing,
    * duplicate-account linking): a pair qualifies only when each vector
    * is the OTHER's single nearest neighbor, the symmetric criterion
    * that filters out hubs (a popular vector is many vectors' NN but
    * reciprocates once at most, so plain top-1 mining drowns in hub
    * pairs that mutual-NN rejects by construction). Scale shape is the
    * SemDeDup partitioning: assign each vector to its nearest coarse
    * centroid (one 10-row broadcast pass), compare pairs ONLY within a
    * cluster — O(Σ cluster²), cluster id is the join key — then take
    * the top-20 mutual pairs by cosine via TakeOrderedAndProject. The
    * planted near-twins (same scheme as q_semantic_dedup) guarantee the
    * mutual path is non-vacuously exercised; label agreement rides
    * along as the mining-quality proxy.
    */
  private val mutualKnn = QueryDef(
    "q_mutual_knn",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e0 = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val e = e0.unionByName(
        e0.filter(col("vec_id") < 10).select(
          (col("vec_id") + 100000).as("vec_id"), col("label"),
          expr("concat(slice(v, 1, 63), array(element_at(v, 64) + 0.1d))").as("v")))
        .cache()
      val centroids = labelCentroids(e)
        .select(col("label").as("cl"), col("centroid"))
      val wAssign = Window.partitionBy("vec_id").orderBy(col("cscore").desc, col("cl"))
      val assigned = e.crossJoin(broadcast(centroids))
        .withColumn("cscore", Ql.r(Vectors.dot(col("v"), col("centroid")), 6))
        .withColumn("arank", row_number().over(wAssign))
        .filter(col("arank") === 1)
        .select(col("cl").as("cluster"), col("vec_id"), col("label"), col("v"),
          sqrt(Vectors.normSq(col("v"))).as("norm"))
      val wnn = Window.partitionBy("d1").orderBy(col("score").desc, col("d2"))
      val nn = assigned
        .select(col("cluster"), col("vec_id").as("d1"), col("label").as("l1"),
          col("v").as("v1"), col("norm").as("n1"))
        .join(assigned.select(col("cluster"), col("vec_id").as("d2"),
          col("label").as("l2"), col("v").as("v2"), col("norm").as("n2")),
          "cluster")
        .filter(col("d1") =!= col("d2"))
        .withColumn("score",
          Ql.r(Vectors.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4))
        .withColumn("rn", row_number().over(wnn))
        .filter(col("rn") === 1)
        .select("d1", "d2", "l1", "l2", "score")
        .localCheckpoint(true) // both sides of the reciprocity join
      val out = nn
        .join(nn.select(col("d1").as("m2"), col("d2").as("m1")),
          col("d1") === col("m1") && col("d2") === col("m2"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"), col("score"),
          (col("l1") === col("l2")).cast("int").as("same_label"))
        .orderBy(col("score").desc, col("d1")).limit(20)
      e.unpersist(false)
      out
    },
    Some(s"""
      WITH e0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
      e AS (
        SELECT * FROM e0
        UNION ALL
        SELECT vec_id + 100000, label, v[1:63] || [v[64] + 0.1] FROM e0 WHERE vec_id < 10),
      cent AS (
        SELECT label AS cl, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, g.i AS pos, avg(v[g.i]) AS c
              FROM e, generate_series(1, 64) g(i)
              GROUP BY 1, 2)
        GROUP BY 1),
      assigned AS (
        SELECT cl AS cluster, vec_id, label, v,
               sqrt(list_dot_product(v, v)) AS norm
        FROM e, cent
        QUALIFY row_number() OVER (PARTITION BY vec_id
          ORDER BY round(list_dot_product(v, centroid) + 1e-9, 6) DESC, cl) = 1),
      nn AS (
        SELECT d1, d2, l1, l2, score FROM (
          SELECT a.vec_id AS d1, b.vec_id AS d2, a.label AS l1, b.label AS l2,
                 ${Ql.R("list_dot_product(a.v, b.v) / (a.norm * b.norm)", 4)} AS score
          FROM assigned a JOIN assigned b
            ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
        QUALIFY row_number() OVER (PARTITION BY d1 ORDER BY score DESC, d2) = 1)
      SELECT x.d1, x.d2, x.score,
             CAST(x.l1 = x.l2 AS INT) AS same_label
      FROM nn x JOIN nn y ON x.d1 = y.d2 AND x.d2 = y.d1
      WHERE x.d1 < x.d2
      ORDER BY x.score DESC, x.d1 LIMIT 20
    """))

  /** Greedy facility-location data selection (Nemhauser, Wolsey &
    * Fisher 1978's (1−1/e) greedy; the coreset-selection shape of
    * Mirzasoleiman et al. 2020, public): pick k = 5 exemplars from a
    * deterministic candidate pool (vec_id ≡ 0 mod 10) maximizing
    * F(S) = Σ_v max_{s∈S} sim(v, s) — the "cover the embedding space
    * with few representatives" objective behind data-subset selection
    * for training. Each greedy round is ONE corpus × remaining-pool
    * scan (pool broadcast, the q_similar_topk shape) plus a corpus-keyed
    * best-coverage update; per-pair marginal terms round to exact
    * micro-unit BIGINTs so the argmax is order-independent, and picks
    * tie-break on candidate id. Similarity is the raw dot product
    * ([[graft.functions.DotProduct]] / list_dot_product, the proven
    * cross-engine pair). Oracle = 5 unrolled MATERIALIZED rounds
    * (fact #38). Reports each pick's marginal gain and the running
    * objective. Contract when the pool is smaller than k: once the pool
    * is exhausted, later rounds pick nothing in BOTH engines (the
    * emptied coverage frame keeps them empty), so the output is
    * min(k, |pool|) rows — by design, not an error.
    */
  private val submodularSelect = QueryDef(
    "q_submodular_select",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
        .localCheckpoint(true)
      var cands = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("c"), col("v").as("cv"))
        .localCheckpoint(true)
      var best = e.select(col("vec_id"), lit(0.0).as("best"))
        .localCheckpoint(true)
      var sel: org.apache.spark.sql.DataFrame = null
      // The similarity matrix is NOT materialized (r17): the old shape
      // localCheckpointed the |corpus|×|pool| sims frame per round to
      // share it between the pick and the coverage update — two extra
      // eager jobs per round locally, and at 100 TB a corpus×pool
      // materialization no sane plan would make. The matrix is a cheap
      // streaming computation off the checkpointed e/best leaves
      // (broadcast pool + codegen dot products), so the pick and the
      // update each stream it once: 2 eager jobs per round instead of 4,
      // nothing corpus×pool ever stored (guide §1.2: fix the shape, not
      // the constants). Per-round release now only retires the previous
      // round's best snapshot.
      var prevRoundIds: Set[Int] = Set.empty
      for (r <- 1 to 5) {
        val preRound = sc.getPersistentRDDs.keySet
        def sims = e.join(best, "vec_id")
          .crossJoin(broadcast(cands))
          .select(col("vec_id"), col("c"),
            Ql.r(Vectors.dot(col("v"), col("cv")), 6).as("sim"), col("best"))
        val picked = sims
          .selectExpr("c",
            s"CAST(${Ql.R("greatest(sim - best, 0e0) * 1000000", 0)} AS BIGINT) AS tu")
          .groupBy("c").agg(sum("tu").as("gu"))
          .orderBy(col("gu").desc, col("c")).limit(1)
          .withColumn("rank", lit(r))
          .localCheckpoint(true) // 1 row — read again by sel AFTER the loop
        val pickedIds = (sc.getPersistentRDDs.keySet -- preRound).toSet
        // coverage update against the ONE picked vector, not the whole
        // pool: the old `sims ⋈ picked` kept only the picked candidate's
        // rows but still COMPUTED corpus × pool dot products first (the
        // broadcast hash join probes the projected rows; Catalyst never
        // pushes a join below the projection that builds `sim`). Joining
        // the 1-row picked vector in before the dot product makes the
        // update corpus × 1 work — identical values (same vectors, same
        // 6-dp rounding), and at 100 TB the difference between one
        // corpus-sized pass and a corpus × pool pass per round.
        val pickedVec = cands.join(picked.select("c"), Seq("c"))
        best = e.join(best, "vec_id")
          .crossJoin(broadcast(pickedVec))
          .select(col("vec_id"),
            greatest(col("best"),
              Ql.r(Vectors.dot(col("v"), col("cv")), 6)).as("best"))
          .localCheckpoint(true)
        cands = cands.join(picked.select("c"), Seq("c"), "left_anti")
        sel = if (sel == null) picked else sel.unionByName(picked)
        // dead: the PREVIOUS round's best snapshot. NEVER the picked rows
        // — sel reads every picked checkpoint after the loop, and a
        // released localCheckpoint cannot be recomputed.
        sc.getPersistentRDDs
          .filter { case (id, _) => prevRoundIds(id) }
          .values.foreach(_.unpersist(blocking = false))
        prevRoundIds =
          (sc.getPersistentRDDs.keySet -- preRound).toSet -- pickedIds
      }
      val out = sel
        .withColumn("objective", Ql.r(
          sum("gu").over(Window.orderBy("rank")
            .rowsBetween(Window.unboundedPreceding, 0)) / lit(1e6), 4))
        .select(col("rank"), col("c").as("vec_id"),
          Ql.r(col("gu") / lit(1e6), 4).as("marginal_gain"), col("objective"))
        .orderBy("rank")
      val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      val collected = out.localCheckpoint(true)
      mine.values.foreach(_.unpersist(blocking = false))
      collected
    },
    Some {
      val rounds = (1 to 5).map { r =>
        s"""
      s$r AS MATERIALIZED (
        SELECT e.vec_id, c.c,
               ${Ql.R("list_dot_product(e.v, c.cv)", 6)} AS sim, b.best
        FROM e JOIN best${r - 1} b ON e.vec_id = b.vec_id, cand${r - 1} c),
      p$r AS MATERIALIZED (
        SELECT $r AS rank, c, gu FROM (
          SELECT c, CAST(sum(CAST(${Ql.R("greatest(sim - best, 0e0) * 1000000", 0)} AS BIGINT)) AS BIGINT) AS gu
          FROM s$r GROUP BY 1)
        ORDER BY gu DESC, c LIMIT 1),
      best$r AS MATERIALIZED (
        SELECT s.vec_id, greatest(s.best, s.sim) AS best
        FROM s$r s JOIN p$r p ON s.c = p.c),
      cand$r AS MATERIALIZED (
        SELECT * FROM cand${r - 1} WHERE c NOT IN (SELECT c FROM p$r))"""
      }.mkString(",")
      s"""
      WITH e AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      cand0 AS MATERIALIZED (
        SELECT vec_id AS c, v AS cv FROM e WHERE vec_id % 10 = 0),
      best0 AS MATERIALIZED (SELECT vec_id, 0e0 AS best FROM e),$rounds,
      sel AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
              UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
              UNION ALL SELECT * FROM p5)
      SELECT rank, c AS vec_id,
             ${Ql.R("gu / 1e6", 4)} AS marginal_gain,
             ${Ql.R("CAST(sum(gu) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e6", 4)}
               AS objective
      FROM sel ORDER BY rank
    """
    })

  /** Embedding-table QA audit — the ingest gate every ANN/semantic-dedup
    * stage should run before trusting a vendor's vectors: per label, row
    * and dimension counts (dim_min = dim_max pins a ragged table), zero
    * vectors (cosine-undefined; they silently match nothing or
    * everything depending on the scorer), NaN carriers, and the L2-norm
    * profile (un-normalized embeddings break dot-for-cosine shortcuts).
    * Two planted defect rows under label −1 — a zero vector and a NaN
    * carrier — keep every defect column's nonzero path exercised. Norms
    * use the SERVED codegen dot ([[Vectors.dot]], the q_similar_topk
    * scorer), are rounded at 6 dp, and the per-label mean folds
    * micro-unit BIGINTs (order-independent; NaN rows excluded from norm
    * stats, counted separately). One corpus scan, label-sized output.
    */
  private val embeddingNormAudit = QueryDef(
    "q_embedding_norm_audit",
    (spark, sfDir) => {
      val plants = spark.range(2).selectExpr(
        "id + 900000 AS vec_id",
        """transform(sequence(1, 64),
             i -> CAST(CASE WHEN id = 1 AND i = 1 THEN 'NaN' ELSE '0' END AS FLOAT))
           AS embedding""",
        "CAST(-1 AS INT) AS label")
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("label"))
        .unionByName(plants)
        .withColumn("dim", size(col("embedding")))
        .withColumn("ss",
          graft.functions.Vectors.dot(
            graft.functions.Vectors.toDouble(col("embedding")),
            graft.functions.Vectors.toDouble(col("embedding"))))
        .withColumn("is_nan", isnan(col("ss")))
        .withColumn("norm", when(!col("is_nan"), Ql.r(sqrt(col("ss")), 6)))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_vecs"),
          min("dim").as("dim_min"), max("dim").as("dim_max"),
          sum(col("is_nan").cast("long")).as("n_nan_vecs"),
          sum((!col("is_nan") && col("ss") === 0.0).cast("long")).as("n_zero_vecs"),
          sum(expr(s"CAST(${Ql.R("norm * 1000000", 0)} AS BIGINT)")).as("sum_u"),
          (count(lit(1)) - sum(col("is_nan").cast("long"))).as("fin_n"),
          min("norm").as("min_norm"), max("norm").as("max_norm"))
        .selectExpr("label", "n_vecs", "dim_min", "dim_max",
          "n_nan_vecs", "n_zero_vecs",
          s"${Ql.R("CAST(sum_u AS DOUBLE) / 1e6 / fin_n", 6)} AS avg_norm",
          "min_norm", "max_norm")
        .orderBy("label")
    },
    Some(s"""
      WITH plants AS (
        SELECT 900000 AS vec_id,
               list_transform(generate_series(1, 64), i -> CAST(0 AS FLOAT)) AS embedding,
               -1 AS label
        UNION ALL
        SELECT 900001,
               list_transform(generate_series(1, 64),
                 i -> CASE WHEN i = 1 THEN CAST('nan' AS FLOAT) ELSE CAST(0 AS FLOAT) END),
               -1),
      u AS (SELECT vec_id, embedding, label FROM embeddings
            UNION ALL SELECT vec_id, embedding, label FROM plants),
      s AS (
        SELECT label, len(embedding) AS dim,
               list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                list_transform(embedding, x -> CAST(x AS DOUBLE))) AS ss
        FROM u),
      f AS (
        SELECT label, dim, isnan(ss) AS is_nan, ss,
               CASE WHEN NOT isnan(ss) THEN ${Ql.R("sqrt(ss)", 6)} END AS norm
        FROM s),
      a AS (
        SELECT label, count(*) AS n_vecs,
               CAST(min(dim) AS INT) AS dim_min, CAST(max(dim) AS INT) AS dim_max,
               CAST(sum(CASE WHEN is_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_vecs,
               CAST(sum(CASE WHEN NOT is_nan AND ss = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
               CAST(sum(CAST(${Ql.R("norm * 1000000", 0)} AS BIGINT)) AS BIGINT) AS sum_u,
               CAST(count(*) - sum(CASE WHEN is_nan THEN 1 ELSE 0 END) AS BIGINT) AS fin_n,
               min(norm) AS min_norm, max(norm) AS max_norm
        FROM f GROUP BY 1)
      SELECT label, n_vecs, dim_min, dim_max, n_nan_vecs, n_zero_vecs,
             ${Ql.R("CAST(sum_u AS DOUBLE) / 1e6 / fin_n", 6)} AS avg_norm,
             min_norm, max_norm
      FROM a ORDER BY label
    """))

  /** IVF list-occupancy audit — the ANN-side twin of
    * q_lsh_bucket_occupancy: an inverted-file index is only as fast as
    * its WORST probed list, so before trusting q_ann_ivf's nprobe/K cost
    * model an index owner reads the list-size distribution and what the
    * serving probe set actually scans. Per list (= coarse cluster):
    * size, corpus share, and how many of the 20 probe queries (the
    * q_ann_nprobe_sweep probe set) hit it under the SAME rounded-cscore
    * nprobe=2 rule q_ann_ivf ships; plus
    * summary columns — size CV (exact integer sum-of-squares form),
    * max/mean imbalance, and measured mean scanned-per-query vs the
    * uniform-list 2N/K the cost model assumes. A hot list shows up as
    * probes_hit × size dominating scan share. Scale shape: one keyed
    * count (K rows), one 20×K broadcast probe pass — nothing
    * corpus-pairwise; the report is K rows.
    */
  private val ivfListBalance = QueryDef(
    "q_ivf_list_balance",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
      val lists = e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .localCheckpoint(true) // K rows; feeds probe-cost join AND summary
      val centroids = labelCentroids(e)
      val wProbe = Window.partitionBy("qid").orderBy(col("cscore").desc, col("label"))
      val probed = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
        .crossJoin(broadcast(centroids))
        // centroid components come from avg() (partitioning-dependent sum
        // order) — rank on the rounded score per the rounding contract
        .withColumn("cscore", Ql.r(Vectors.dot(col("qv"), col("centroid")), 6))
        .withColumn("crank", row_number().over(wProbe))
        .filter(col("crank") <= 2)
        .select(col("qid"), col("label"))
        // ~2·n_q rows; feeds the hits rollup AND the scan-cost rollup —
        // materialize so the centroid+probe pass runs once, structurally
        .localCheckpoint(true)
      val hits = probed.groupBy("label").agg(count(lit(1)).as("probes_hit"))
      val summary = lists
        .agg(count(lit(1)).as("k_lists"), sum(col("n_vecs")).as("n_total"),
          max(col("n_vecs")).as("max_list"),
          sum(col("n_vecs") * col("n_vecs")).as("ss"))
        .crossJoin(broadcast(
          probed.join(broadcast(lists), "label")
            .groupBy("qid").agg(sum(col("n_vecs")).as("scan"))
            .agg(count(lit(1)).as("n_q"), sum(col("scan")).as("scan_total"))))
        .selectExpr(
          "n_total", "scan_total",
          s"${Ql.R("sqrt(CAST(k_lists * ss - n_total * n_total AS DOUBLE)) / n_total", 6)} AS size_cv",
          s"${Ql.R("CAST(max_list * k_lists AS DOUBLE) / n_total", 4)} AS imbalance",
          s"${Ql.R("CAST(scan_total AS DOUBLE) / n_q", 4)} AS mean_scan",
          s"${Ql.R("2.0 * n_total / k_lists", 4)} AS uniform_scan")
      lists.join(hits, Seq("label"), "left")
        .crossJoin(broadcast(summary))
        .selectExpr("label", "n_vecs",
          s"${Ql.R("100.0 * n_vecs / n_total", 4)} AS size_pct",
          "coalesce(probes_hit, CAST(0 AS BIGINT)) AS probes_hit",
          s"${Ql.R("100.0 * n_vecs * coalesce(probes_hit, CAST(0 AS BIGINT)) / scan_total", 4)} AS scan_pct",
          "size_cv", "imbalance", "mean_scan", "uniform_scan")
        .orderBy("label")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      lists AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY 1),
      cent AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, g.i AS pos, avg(v[g.i]) AS c
              FROM e, generate_series(1, 64) g(i)
              GROUP BY 1, 2)
        GROUP BY label),
      probed AS (
        SELECT qid, label FROM (
          SELECT q.vec_id AS qid, cent.label,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY round(list_dot_product(q.v, centroid) + 1e-9, 6) DESC, cent.label) AS crank
          FROM e q, cent WHERE q.vec_id < 20)
        WHERE crank <= 2),
      hits AS (SELECT label, count(*) AS probes_hit FROM probed GROUP BY 1),
      scans AS (
        SELECT qid, CAST(sum(n_vecs) AS BIGINT) AS scan
        FROM probed JOIN lists USING (label) GROUP BY 1),
      summary AS (
        SELECT count(*) AS k_lists, CAST(sum(n_vecs) AS BIGINT) AS n_total,
               CAST(max(n_vecs) AS BIGINT) AS max_list,
               CAST(sum(n_vecs * n_vecs) AS BIGINT) AS ss,
               (SELECT count(*) FROM scans) AS n_q,
               (SELECT CAST(sum(scan) AS BIGINT) FROM scans) AS scan_total
        FROM lists)
      SELECT l.label, CAST(l.n_vecs AS BIGINT) AS n_vecs,
             ${Ql.R("100.0 * l.n_vecs / s.n_total", 4)} AS size_pct,
             CAST(coalesce(h.probes_hit, 0) AS BIGINT) AS probes_hit,
             ${Ql.R("100.0 * l.n_vecs * coalesce(h.probes_hit, 0) / s.scan_total", 4)} AS scan_pct,
             ${Ql.R("sqrt(CAST(s.k_lists * s.ss - s.n_total * s.n_total AS DOUBLE)) / s.n_total", 6)} AS size_cv,
             ${Ql.R("CAST(s.max_list * s.k_lists AS DOUBLE) / s.n_total", 4)} AS imbalance,
             ${Ql.R("CAST(s.scan_total AS DOUBLE) / s.n_q", 4)} AS mean_scan,
             ${Ql.R("2.0 * s.n_total / s.k_lists", 4)} AS uniform_scan
      FROM lists l LEFT JOIN hits h ON l.label = h.label, summary s
      ORDER BY l.label
    """))

  /** Prototype-based data pruning (Sorscher et al. NeurIPS'22, public):
    * within each embedding cluster, the vectors MOST similar to their
    * centroid are the most prototypical — and on large corpora pruning
    * prototypical examples (keeping the hard ones) beats random
    * selection. Runs over the SAME plants-augmented centroid-bucketed
    * scaffold as q_semantic_dedup ([[semAssigned]]), drops the top ~30%
    * most-prototypical per cluster, and reports per cluster: volumes,
    * the cosine threshold, and kept-vs-dropped mean prototypicality.
    * The per-cluster quantile is EXACT but never ranks doc-level rows:
    * cosines quantize to 4-dp integer keys (≤20001 buckets/cluster at
    * ANY corpus size), the cut comes from a cumulative count over that
    * bounded histogram, and docs get their verdict from a broadcast
    * K-row threshold join — the q_ccnet_ppl_buckets discipline. The
    * drop rule is bucket-granular (every doc with key ≥ k* drops, so
    * ties overshoot the 30% target together — documented, both engines
    * identical); every nonempty cluster prunes at least ceil(0.3·n).
    */
  private val protoPruning = QueryDef(
    "q_proto_pruning",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val (e, assigned, cents) = semAssigned(spark, sfDir)
      val centroids = cents
        .select(col("cl").as("cluster"), col("centroid"),
          sqrt(Vectors.normSq(col("centroid"))).as("cnorm"))
      val kd = assigned
        .join(broadcast(centroids), "cluster")
        .withColumn("proto",
          Ql.r(Vectors.dot(col("v"), col("centroid")) / (col("norm") * col("cnorm")), 4))
        .withColumn("k", expr(s"CAST(${Ql.R("proto * 10000", 0)} AS BIGINT)"))
        .select("cluster", "vec_id", "k")
        // feeds the bucket histogram AND the verdict rollup — one pass
        .localCheckpoint(true)
      e.unpersist(false)
      val h = kd.groupBy("cluster", "k").agg(count(lit(1)).as("hn"))
      val wCum = Window.partitionBy("cluster").orderBy(col("k").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = h
        .withColumn("cum", sum(col("hn")).over(wCum))
        .withColumn("n", sum(col("hn")).over(Window.partitionBy("cluster")))
        .filter(col("cum") >= expr("(3 * n + 9) div 10"))
        .groupBy("cluster")
        .agg(max(col("k")).as("k_star"), max(col("n")).as("n_vecs"),
          max(expr("(3 * n + 9) div 10")).as("target_drop"))
      kd.join(broadcast(thr), "cluster")
        .withColumn("dropped", col("k") >= col("k_star"))
        .groupBy("cluster")
        .agg(
          max(col("n_vecs")).as("n_vecs"),
          max(col("target_drop")).as("target_drop"),
          sum(col("dropped").cast("long")).as("n_dropped"),
          sum((!col("dropped")).cast("long")).as("n_kept"),
          Ql.r(max(col("k_star")) / lit(10000.0), 4).as("thr_cos"),
          sum(when(col("dropped"), col("k"))).as("sd"),
          sum(when(!col("dropped"), col("k"))).as("sk"))
        .selectExpr("cluster", "n_vecs", "target_drop", "n_dropped", "n_kept",
          "thr_cos",
          s"${Ql.R("CAST(sd AS DOUBLE) / n_dropped / 10000.0", 4)} AS mean_cos_dropped",
          s"CASE WHEN n_kept = 0 THEN NULL ELSE ${Ql.R("CAST(sk AS DOUBLE) / n_kept / 10000.0", 4)} END AS mean_cos_kept")
        .orderBy("cluster")
    },
    Some(s"""
      WITH $semAssignedSql,
      kd AS (
        SELECT cluster, vec_id,
               CAST(${Ql.R(s"${Ql.R("list_dot_product(v, centroid) / (norm * sqrt(list_dot_product(centroid, centroid)))", 4)} * 10000", 0)} AS BIGINT) AS k
        FROM assigned JOIN cent ON assigned.cluster = cent.cl),
      h AS (SELECT cluster, k, count(*) AS hn FROM kd GROUP BY 1, 2),
      c AS (
        SELECT cluster, k,
               sum(hn) OVER (PARTITION BY cluster ORDER BY k DESC
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(hn) OVER (PARTITION BY cluster) AS n
        FROM h),
      thr AS (
        SELECT cluster, max(k) AS k_star, max(n) AS n_vecs,
               max((3 * n + 9) // 10) AS target_drop
        FROM c WHERE cum >= (3 * n + 9) // 10
        GROUP BY 1),
      v AS (
        SELECT kd.cluster, kd.k, (kd.k >= thr.k_star) AS dropped,
               thr.n_vecs, thr.target_drop, thr.k_star
        FROM kd JOIN thr ON kd.cluster = thr.cluster)
      SELECT cluster, CAST(max(n_vecs) AS BIGINT) AS n_vecs,
             CAST(max(target_drop) AS BIGINT) AS target_drop,
             CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
             ${Ql.R("max(k_star) / 10000.0", 4)} AS thr_cos,
             ${Ql.R("CAST(sum(CASE WHEN dropped THEN k END) AS DOUBLE) / sum(CASE WHEN dropped THEN 1 ELSE 0 END) / 10000.0", 4)} AS mean_cos_dropped,
             CASE WHEN sum(CASE WHEN dropped THEN 0 ELSE 1 END) = 0 THEN NULL
                  ELSE ${Ql.R("CAST(sum(CASE WHEN dropped THEN NULL ELSE k END) AS DOUBLE) / sum(CASE WHEN dropped THEN 0 ELSE 1 END) / 10000.0", 4)} END AS mean_cos_kept
      FROM v GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] = Seq(
    similarTopk, knnVote, annIvf, annNprobeSweep, docEmbedJoin, embedQuantize,
    pqCodes, semanticDedup, semdedupEpsSweep, annIvfPq, annRecall, docOutlier,
    silhouette, embeddingDrift, mutualKnn, submodularSelect, embeddingNormAudit,
    ivfListBalance, protoPruning)
}
