package graft.operators

import graft.{QueryDef, QueryModule}
import graft.multimodal.MultimodalPipeline
import org.apache.spark.sql.functions._

/** Oracle-checked queries over the multimodal pipeline. The stub decoder's
  * md5 arithmetic is replicated in DuckDB SQL, so the mapPartitions path is
  * value-checked end to end, not just smoke-tested.
  */
object MultimodalQueries extends QueryModule {

  // hex digit -> value, as SQL (both engines: position in the hex alphabet)
  private def hexValSql(expr: String): String =
    s"(strpos('0123456789abcdef', $expr) - 1)"

  /** Decode features per media object (doc_id<100). */
  private val multimodalFeatures = QueryDef(
    "q_multimodal_features",
    (spark, sfDir) => {
      // cached: the decode feeds both the feature projection and the
      // resize branch — one decode pass, not two
      val feats = MultimodalPipeline.extractFeatures(
        MultimodalPipeline.mediaTable(spark, sfDir).filter(col("doc_id") < 100)).cache()
      val resized = MultimodalPipeline.resize(feats)
        .select(col("doc_id"), col("width").as("r_w"), col("height").as("r_h"))
      feats.toDF()
        .join(resized, "doc_id")
        .select(col("doc_id"), col("media_type"), col("byte_len"),
          col("width"), col("height"), col("n_frames"),
          col("r_w"), col("r_h"),
          element_at(col("frame_hashes"), 1).as("frame0"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS INT) AS byte_len,
               md5(text) AS h
        FROM documents WHERE doc_id < 100)
      SELECT doc_id, media_type, byte_len, width, height, n_frames,
             224 AS r_w,
             CAST(height * 224 // width AS INT) AS r_h,
             md5(h || ':0') AS frame0
      FROM (SELECT doc_id, media_type, byte_len, h,
                   CAST(64 + 8 * ${hexValSql("substr(h, 1, 1)")} AS INT) AS width,
                   CAST(64 + 8 * ${hexValSql("substr(h, 2, 1)")} AS INT) AS height,
                   CAST(1 + ${hexValSql("substr(h, 3, 1)")} % 8 AS INT) AS n_frames
            FROM m)
      ORDER BY doc_id
    """))

  /** Frame fan-out: one row per sampled frame (doc_id<20). */
  private val multimodalFrames = QueryDef(
    "q_multimodal_frames",
    (spark, sfDir) =>
      MultimodalPipeline.sampleFrames(
        MultimodalPipeline.extractFeatures(
          MultimodalPipeline.mediaTable(spark, sfDir).filter(col("doc_id") < 20)))
        .orderBy("doc_id", "frame_idx"),
    Some(s"""
      WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               md5(text) AS h,
               1 + ${hexValSql("substr(md5(text), 3, 1)")} % 8 AS n_frames
        FROM documents WHERE doc_id < 20)
      SELECT doc_id, media_type, CAST(i AS INT) AS frame_idx,
             md5(h || ':' || i) AS frame_hash
      FROM (SELECT doc_id, media_type, h,
                   unnest(generate_series(0, n_frames - 1)) AS i
            FROM m)
      ORDER BY doc_id, frame_idx
    """))

  /** Byte-identical media dedup: group media objects by the sha-256 of
    * the opaque binary payload (never by the payload itself — at 100 TB
    * the shuffle moves 32-byte digests, not images) and report, per
    * media type, object / distinct / duplicate counts and the largest
    * duplicate group. Ten exact copies (doc_id+201000 — the offset is ≡0 mod 3
    * so each copy keeps its original media_type bucket; payload reused
    * from doc_id<10) are planted so the detector has known truth; the dup can only be
    * found if it shares its original's bucket. The
    * oracle groups by the payload's text preimage — engines need not
    * share a hash function when only group COUNTS are compared, and a
    * crypto hash is injective on any real corpus.
    */
  private val mediaDedup = QueryDef(
    "q_media_dedup",
    (spark, sfDir) => {
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val planted = docs.unionByName(
        docs.filter(col("doc_id") < 10)
          .select((col("doc_id") + 201000).as("doc_id"), col("text")))
      planted
        .select(
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          sha2(encode(col("text"), "UTF-8"), 256).as("h"))
        .groupBy("media_type", "h")
        .agg(count(lit(1)).as("grp"))
        .groupBy("media_type")
        .agg(
          sum("grp").as("n_objects"),
          count(lit(1)).as("n_distinct"),
          sum(col("grp") - 1).as("n_dup_objects"),
          max("grp").as("max_group"))
        .orderBy("media_type")
    },
    Some("""
      WITH m AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               text
        FROM (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 201000, text FROM documents WHERE doc_id < 10)),
      g AS (SELECT media_type, text, CAST(count(*) AS BIGINT) AS grp
            FROM m GROUP BY 1, 2)
      SELECT media_type,
             CAST(sum(grp) AS BIGINT) AS n_objects,
             count(*) AS n_distinct,
             CAST(sum(grp - 1) AS BIGINT) AS n_dup_objects,
             max(grp) AS max_group
      FROM g GROUP BY media_type ORDER BY media_type
    """))

  /** Metadata quality gate over the full media corpus — the pre-decode
    * filter every multimodal ingest runs (resolution floors for images/
    * video, frame floors for video, size floors for audio) so the
    * expensive decode stage never sees junk. Gates are pure metadata
    * predicates (the 100 TB point: this pass reads extracted metadata
    * columns, never payload bytes); per-type pass/reject counts and the
    * dominant reject reason are the report. The stub decoder's
    * md5-derived dimensions are mirrored in the oracle, so the gate
    * logic is value-checked end to end.
    */
  private val mediaQualityGate = QueryDef(
    "q_media_quality_gate",
    (spark, sfDir) => {
      val feats = MultimodalPipeline.extractFeatures(
        MultimodalPipeline.mediaTable(spark, sfDir)).toDF()
      feats
        .withColumn("reject_reason",
          when(col("media_type").isin("image", "video") &&
            (col("width") < 96 || col("height") < 96), "low_res")
            .when(col("media_type") === "video" && col("n_frames") < 4, "too_few_frames")
            .when(col("media_type") === "audio" && col("byte_len") < 64, "too_small")
            .otherwise("pass"))
        .groupBy("media_type", "reject_reason")
        .agg(count(lit(1)).as("n"), sum(col("byte_len").cast("long")).as("bytes"))
        .orderBy("media_type", "reject_reason")
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS INT) AS byte_len,
               md5(text) AS h
        FROM documents),
      f AS (
        SELECT doc_id, media_type, byte_len,
               CAST(64 + 8 * ${hexValSql("substr(h, 1, 1)")} AS INT) AS width,
               CAST(64 + 8 * ${hexValSql("substr(h, 2, 1)")} AS INT) AS height,
               CAST(1 + ${hexValSql("substr(h, 3, 1)")} % 8 AS INT) AS n_frames
        FROM m),
      g AS (
        SELECT media_type, byte_len,
               CASE WHEN media_type IN ('image', 'video')
                      AND (width < 96 OR height < 96) THEN 'low_res'
                    WHEN media_type = 'video' AND n_frames < 4 THEN 'too_few_frames'
                    WHEN media_type = 'audio' AND byte_len < 64 THEN 'too_small'
                    ELSE 'pass' END AS reject_reason
        FROM f)
      SELECT media_type, reject_reason, count(*) AS n,
             CAST(sum(byte_len) AS BIGINT) AS bytes
      FROM g GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** Modality mixture report — the per-modality share of objects and
    * bytes a data-mixture planner balances before training (the
    * multimodal twin of q_mix_weights). One metadata aggregation;
    * shares are single rounded divides against 1-row corpus totals.
    */
  private val modalityMix = QueryDef(
    "q_modality_mix",
    (spark, sfDir) => {
      val feats = MultimodalPipeline.extractFeatures(
        MultimodalPipeline.mediaTable(spark, sfDir)).toDF()
        .groupBy("media_type")
        .agg(count(lit(1)).as("n_objects"),
          sum(col("byte_len").cast("long")).as("bytes"),
          sum(col("n_frames").cast("long")).as("frames"))
      val tot = feats.agg(sum("n_objects").as("nt"), sum("bytes").as("bt"))
      feats.crossJoin(broadcast(tot))
        .selectExpr("media_type", "n_objects", "bytes", "frames",
          s"${Ql.R("100.0 * n_objects / nt", 4)} AS object_pct",
          s"${Ql.R("100.0 * bytes / bt", 4)} AS byte_pct")
        .orderBy("media_type")
    },
    Some(s"""
      WITH m AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS INT) AS byte_len,
               CAST(1 + ${hexValSql("substr(md5(text), 3, 1)")} % 8 AS INT) AS n_frames
        FROM documents),
      g AS (
        SELECT media_type, count(*) AS n_objects,
               CAST(sum(byte_len) AS BIGINT) AS bytes,
               CAST(sum(n_frames) AS BIGINT) AS frames
        FROM m GROUP BY 1),
      t AS (SELECT CAST(sum(n_objects) AS BIGINT) AS nt,
                   CAST(sum(bytes) AS BIGINT) AS bt FROM g)
      SELECT media_type, n_objects, bytes, frames,
             ${Ql.R("100.0 * n_objects / nt", 4)} AS object_pct,
             ${Ql.R("100.0 * bytes / bt", 4)} AS byte_pct
      FROM g CROSS JOIN t ORDER BY media_type
    """))

  override def defs: Seq[QueryDef] =
    Seq(multimodalFeatures, multimodalFrames, mediaDedup, mediaQualityGate,
      modalityMix)
}
