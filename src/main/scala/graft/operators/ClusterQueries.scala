package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup clustering (the step after candidate detection): connected
  * components over the candidate-pair graph, so each duplicate group gets
  * a canonical representative (min doc_id). Spark side is iterative
  * min-label propagation to a fixpoint — each round one join + one
  * aggregate, the standard large-graph CC shape (GraphX-free). Oracle is a
  * recursive-CTE transitive closure (fine at oracle scale; the iterative
  * form is the one that scales).
  */
object ClusterQueries extends QueryModule {

  /** Candidate edges: docs sharing >= 2 prefix shingles (3-token shingles
    * of the first 12 tokens — selective and cheap; plants guarantee some
    * multi-node components).
    */
  private def edges(spark: SparkSession, sfDir: String): DataFrame = {
    // same planted near-duplicates as the DedupQueries detectors (single
    // source of truth for the plant scheme). Shingles join on their
    // 56-bit md5-prefix int64, hashed map-side before the shuffles (same
    // rationale as q_dedup_ngram_jaccard: 8-byte exchange keys; the
    // oracle applies the identical hash, so collisions cannot diverge).
    val planted = DedupQueries.withPlants(spark, sfDir)
    val psh = planted
      .withColumn("toks", expr("slice(split(text, ' '), 1, 12)"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as("sh0"))
      // hash post-explode in a codegen'd projection, not in the
      // interpreted lambda (see DedupQueries.shingles)
      .select(col("doc_id"), expr(Ql.md5PrefixLong("sh0", 14)).as("sh"))
      .distinct()
    psh.select(col("sh"), col("doc_id").as("d1"))
      .join(psh.select(col("sh"), col("doc_id").as("d2")), "sh")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("common"))
      .filter(col("common") >= 2)
      .select("d1", "d2")
  }

  private val edgesSql =
    s"""WITH RECURSIVE planted AS (
         SELECT * FROM ${DedupQueries.plantsSql}),
       psh AS (
         SELECT DISTINCT doc_id, ${Ql.Md5PrefixLong("sh0", 14)} AS sh
         FROM (
           SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS sh0
           FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 3)) AS i
                 FROM (SELECT doc_id, string_split(text, ' ')[1:12] AS t FROM planted)
                 WHERE len(t) >= 3))),
       edges AS (
         SELECT d1, d2 FROM (
           SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
           FROM psh a JOIN psh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         WHERE common >= 2)"""

  private val dedupClusters = QueryDef(
    "q_dedup_clusters",
    (spark, sfDir) => {
      val e = edges(spark, sfDir).cache()
      // size the loop's shuffles to the CANDIDATE GRAPH, not the corpus
      // default: the edge set after blocking is orders of magnitude
      // smaller than the documents table, so corpus-sized partition counts
      // just multiply per-round scheduler overhead. One partition per
      // ~500k edges, and the count is a cheap action on the cached frame.
      val parts = math.max(1, (e.count() / 500000L).toInt)
      val adj = e.select(col("d1").as("a"), col("d2").as("b"))
        .unionByName(e.select(col("d2").as("a"), col("d1").as("b")))
        .repartition(parts)
        .cache()
      // eager localCheckpoint: iterative DataFrame loops must truncate
      // lineage each round or Catalyst re-analyzes the whole accumulated
      // plan every iteration (superlinear planning blowup)
      var labels = adj.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id"))
        .localCheckpoint(true)
      // min-label propagation to fixpoint (the loop converges in diameter
      // rounds — stop on no change). The old label rides along into the
      // checkpoint so the convergence check is a scan of the materialized
      // frame, not another join+shuffle job per round.
      def propagate(l: DataFrame): DataFrame = {
        val nbrMin = adj.join(l, adj("b") === l("id"))
          .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
        l.join(nbrMin, l("id") === nbrMin("a"), "left")
          .select(col("id"), col("lbl").as("old"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      }
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 50) {
        val next = propagate(labels).localCheckpoint(true)
        changed = next.filter(col("lbl") =!= col("old")).count()
        labels = next.select("id", "lbl")
        rounds += 1
      }
      // fail loudly rather than emit unconverged (wrong) components — at
      // scale a >50-diameter component means switch to pointer jumping
      if (changed > 0)
        throw new IllegalStateException(
          s"connected components did not converge in $rounds rounds")
      // members as a comma-joined string: the verify harness hashes flat
      // scalar columns, so array columns are emitted pre-joined
      labels
        .groupBy("lbl").agg(count(lit(1)).as("cluster_size"),
          array_join(transform(sort_array(collect_list(col("id"))),
            _.cast("string")), ",").as("members"))
        .select(col("lbl").as("cluster"), col("cluster_size"), col("members"))
        .orderBy("cluster")
    },
    Some(s"""
      $edgesSql,
      adj AS (SELECT d1 AS a, d2 AS b FROM edges
              UNION ALL SELECT d2, d1 FROM edges),
      nodes AS (SELECT DISTINCT a AS id FROM adj),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT adj.b, reach.r FROM reach JOIN adj ON reach.id = adj.a),
      labels AS (SELECT id, min(r) AS lbl FROM reach GROUP BY 1)
      SELECT lbl AS cluster, count(*) AS cluster_size,
             array_to_string(list_sort(list(id)), ',') AS members
      FROM labels GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] = Seq(dedupClusters)
}
