package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-record decode/parse/transform operators (SURVEY §2.B, §2.A8) — the
  * body of a reference Lambda handler: base64-decode, JSON-parse, validate,
  * project, explode, route dead letters.
  */
object RecordQueries extends QueryModule {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** B5/B6: validate + project + computed column — `if not valid: continue`
    * followed by building the output record.
    */
  private val filterProject = QueryDef(
    "q_filter_project",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Ql.r(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             ${Ql.R("l_extendedprice * (1 - l_discount)")} AS revenue,
             l_returnflag
      FROM lineitem
      WHERE l_quantity > 45 AND l_discount >= 0.05
      ORDER BY l_orderkey, l_linenumber
    """))

  /** B3: JSON path extraction from the payload column. */
  private val jsonExtract = QueryDef(
    "q_json_extract",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .select(expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"), col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), Ql.r(sum(col("value"))).as("sum_value"))
        .orderBy(col("k").asc_nulls_last),
    Some(s"""
      SELECT TRY_CAST(json_extract_string(props, '$$.k') AS INT) AS k,
             count(*) AS n, ${Ql.R("sum(value)")} AS sum_value
      FROM events GROUP BY 1 ORDER BY 1 ASC NULLS LAST
    """))

  /** G8 (Spark 4): VARIANT — schema-less semi-structured ingestion. The
    * payload parses to an open variant (no schema declared up front, the
    * shredding/typing happens at read), fields come out typed via
    * variant_get, and a missing path is NULL rather than an error. Oracle
    * extracts the same values with DuckDB's JSON functions.
    */
  private val jsonVariant = QueryDef(
    "q_json_variant",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", expr("try_variant_get(v, '$.k', 'int')"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(expr(
            "CASE WHEN variant_get(v, '$.missing', 'string') IS NULL THEN 1 ELSE 0 END"))
            .as("n_missing_null"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             min(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
             max(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
             CAST(count(*) AS BIGINT) AS n_missing_null
      FROM events GROUP BY 1 ORDER BY 1
    """))

  /** B2: full JSON parse against a fixed schema (`json.loads` into known
    * fields), then filter + aggregate on the parsed struct.
    */
  private val jsonParse = QueryDef(
    "q_json_parse",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("j", from_json(col("props"), propsSchema))
        .filter(col("j.k") >= 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("j.k").cast("long")).as("sum_k"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      FROM events
      WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) >= 50
      GROUP BY 1 ORDER BY 1
    """))

  /** B7: generator — one record to 0..n records (explode tokens). */
  private val explodeTokens = QueryDef(
    "q_explode_tokens",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occur"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(desc("n_occur"), col("token"))
        .limit(50),
    Some("""
      SELECT token, count(*) AS n_occur, count(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token ORDER BY n_occur DESC, token LIMIT 50
    """))

  /** B1/G9: base64 + hash functions — the Kinesis `data` decode step and
    * content-hash routing/dedup keys.
    */
  private val b64Hash = QueryDef(
    "q_b64_hash",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 20)
        .select(
          col("doc_id"),
          // Spark's base64 is MIME-flavored (CRLF every 76 chars); strip the
          // line breaks to match the canonical un-chunked encoding.
          regexp_replace(base64(encode(col("text"), "UTF-8")), "\r\n", "").as("b64"),
          length(unbase64(base64(encode(col("text"), "UTF-8"))).cast("string")).as("roundtrip_len"),
          md5(col("text").cast("binary")).as("md5_hex"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, to_base64(encode(text)) AS b64,
             CAST(length(text) AS INTEGER) AS roundtrip_len,
             md5(text) AS md5_hex, sha256(text) AS sha256_hex
      FROM documents WHERE doc_id < 20 ORDER BY doc_id
    """))

  /** A8: dead-letter routing — malformed payloads diverted, not fatal.
    * Valid JSON (events.props) and non-JSON (documents.text) are unioned
    * and routed on parse success, the poison-record pattern.
    */
  private val deadLetter = QueryDef(
    "q_dead_letter",
    (spark, sfDir) => {
      val good = Tables.events(spark, sfDir).select(lit("events").as("src"), col("props").as("payload"))
      val bad = Tables.documents(spark, sfDir).select(lit("documents").as("src"), col("text").as("payload"))
      // PERMISSIVE from_json yields a struct-of-nulls for malformed input,
      // not a null struct — route on the corrupt-record column instead,
      // which is true parse-failed semantics.
      val withCorrupt = StructType(
        Seq(StructField("k", IntegerType), StructField("_corrupt", StringType)))
      // cheap structural pre-filter: a JSON *object* must start with '{'
      // (after whitespace), so only plausible rows pay the Jackson parse —
      // the exception path for free-text payloads is skipped entirely.
      // Semantics identical: from_json against a struct schema marks
      // non-object payloads corrupt anyway. CASE evaluates lazily, so
      // from_json never runs on implausible rows.
      good.unionByName(bad)
        .withColumn("is_valid",
          // trim the full JSON whitespace set — Spark's 1-arg ltrim strips
          // only ASCII spaces, but Jackson (and the oracle's json parser)
          // skip tabs/newlines/CR before the opening brace too
          when(ltrim(col("payload"), " \t\r\n").startsWith("{"),
            from_json(col("payload"), withCorrupt,
              Map("columnNameOfCorruptRecord" -> "_corrupt"))
              .getField("_corrupt").isNull)
          .otherwise(lit(false)))
        .groupBy("src", "is_valid")
        .agg(count(lit(1)).as("n"))
        .orderBy("src", "is_valid")
    },
    Some("""
      SELECT src,
             -- struct-parse semantics: a bare JSON scalar/array is valid
             -- JSON but NOT a parseable object (mirrors from_json's
             -- corrupt-record behavior against a struct schema)
             (CASE WHEN json_valid(payload)
                   THEN json_type(payload) = 'OBJECT' ELSE false END) AS is_valid,
             count(*) AS n
      FROM (SELECT 'events' AS src, props AS payload FROM events
            UNION ALL SELECT 'documents', text FROM documents)
      GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** B8: timestamp extraction/normalization — epoch + calendar fields. */
  private val tsExtract = QueryDef(
    "q_ts_extract",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .filter(col("event_id") < 50)
        .select(
          col("event_id"),
          Ql.tstr(col("ts")).as("ts_str"),
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          unix_timestamp(col("ts")).as("epoch_sec"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
             CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
             CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
             CAST(minute(ts) AS INT) AS mi,
             epoch_ns(ts) // 1000000000 AS epoch_sec
      FROM events WHERE event_id < 50 ORDER BY event_id
    """))

  override def defs: Seq[QueryDef] = Seq(
    filterProject, jsonExtract, jsonVariant, jsonParse, explodeTokens,
    b64Hash, deadLetter, tsExtract)
}
