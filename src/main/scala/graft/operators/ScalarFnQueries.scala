package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY §2.G): strings, dates, math,
  * conditionals, arrays, higher-order lambdas, maps. All built-ins — every
  * expression stays inside whole-stage codegen.
  */
object ScalarFnQueries extends QueryModule {

  /** G1: string functions. */
  private val strFuncs = QueryDef(
    "q_str_funcs",
    (spark, sfDir) =>
      Tables.part(spark, sfDir)
        .filter(col("p_partkey") < 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_size").cast("string"), 3, "0").as("size_padded"),
          translate(col("p_name"), "ae", "@3").as("leeted"),
          instr(col("p_name"), "a").as("first_a"),
          levenshtein(col("p_brand"), col("p_type")).as("lev_brand_type"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
             upper(p_name) AS uname,
             substring(p_name, 1, 5) AS prefix,
             concat_ws('-', p_brand, p_type) AS brand_type,
             TRY_CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
             CAST(length(p_name) AS INT) AS name_len,
             lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
             translate(p_name, 'ae', '@3') AS leeted,
             CAST(strpos(p_name, 'a') AS INT) AS first_a,
             CAST(levenshtein(p_brand, p_type) AS INT) AS lev_brand_type
      FROM part WHERE p_partkey < 100 ORDER BY p_partkey
    """))

  /** G1 (cont.): predicate + structural string functions. */
  private val strFuncs2 = QueryDef(
    "q_str_funcs2",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 80)
        .select(
          col("doc_id"),
          expr("split_part(text, ' ', 2)").as("second_word"),
          reverse(expr("split_part(text, ' ', 1)")).as("first_rev"),
          expr("repeat(lang, 2)").as("lang2"),
          col("text").startsWith("the").cast("int").as("starts_the"),
          col("text").endsWith("key").cast("int").as("ends_key"),
          col("text").contains("merge").cast("int").as("has_merge"),
          substring_index(col("text"), " ", 3).as("first3_idx"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             split_part(text, ' ', 2) AS second_word,
             reverse(split_part(text, ' ', 1)) AS first_rev,
             repeat(lang, 2) AS lang2,
             CAST(starts_with(text, 'the') AS INT) AS starts_the,
             CAST(ends_with(text, 'key') AS INT) AS ends_key,
             CAST(contains(text, 'merge') AS INT) AS has_merge,
             array_to_string(string_split(text, ' ')[1:3], ' ') AS first3_idx
      FROM documents WHERE doc_id < 80 ORDER BY doc_id
    """))

  /** G1 (cont.): regexp family — the text-pipeline workhorses. */
  private val regexFuncs = QueryDef(
    "q_regex_funcs",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 80)
        .select(
          col("doc_id"),
          expr("regexp_count(text, 'the')").as("n_the"),
          // partial-match predicate that actually varies across rows (an
          // anchored all-lower check was constant-true corpus-wide, and
          // Java-'$' vs RE2 full-match differ on trailing newlines)
          expr("regexp_like(text, 'scan.*sort')").cast("int").as("scan_then_sort"),
          size(expr("regexp_extract_all(text, '\\\\b\\\\w{5}\\\\b', 0)")).as("n_5letter"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("len_novowels"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, 'the')) AS INT) AS n_the,
             CAST(regexp_matches(text, 'scan.*sort') AS INT) AS scan_then_sort,
             CAST(len(regexp_extract_all(text, '\b\w{5}\b')) AS INT) AS n_5letter,
             CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS len_novowels
      FROM documents WHERE doc_id < 80 ORDER BY doc_id
    """))

  /** G2: date/time functions. */
  private val dateFuncs = QueryDef(
    "q_date_funcs",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since_95"),
          last_day(col("o_orderdate")).as("month_end"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS d,
             CAST(year(o_orderdate) AS INT) AS y,
             CAST(quarter(o_orderdate) AS INT) AS q,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(isodow(o_orderdate) AS INT) AS isodow,
             CAST(o_orderdate AS DATE) + 30 AS plus30,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             strftime(o_orderdate, '%Y-%m') AS ym,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
      FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """))

  /** G3: math functions. */
  private val mathFuncs = QueryDef(
    "q_math_funcs",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_orderkey") < 50)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          Ql.r(abs(col("l_discount") - 0.05), 4).as("abs_disc_diff"),
          Ql.r(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
          Ql.r(pow(col("l_quantity"), 2)).as("qty_sq"),
          Ql.r(log(col("l_extendedprice")), 4).as("ln_price"),
          Ql.r(log10(col("l_extendedprice")), 4).as("log10_price"),
          signum(col("l_tax") - 0.04).cast("int").as("tax_sign"),
          greatest(col("l_quantity"), lit(10.0)).as("qty_at_least_10"),
          least(col("l_quantity"), lit(10.0)).as("qty_at_most_10"),
          pmod(col("l_partkey"), lit(7)).as("partkey_mod7"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             ${Ql.R("abs(l_discount - 0.05)", 4)} AS abs_disc_diff,
             ${Ql.R("sqrt(l_quantity)", 4)} AS sqrt_qty,
             ${Ql.R("pow(l_quantity, 2)")} AS qty_sq,
             ${Ql.R("ln(l_extendedprice)", 4)} AS ln_price,
             ${Ql.R("log10(l_extendedprice)", 4)} AS log10_price,
             CAST(sign(l_tax - 0.04) AS INT) AS tax_sign,
             greatest(l_quantity, 10.0) AS qty_at_least_10,
             least(l_quantity, 10.0) AS qty_at_most_10,
             (l_partkey % 7 + 7) % 7 AS partkey_mod7
      FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber
    """))

  /** G4: conditional / null handling. */
  /** G4 (Spark 4 ANSI mode): the try_* error-safe family. Spark 4 runs
    * ANSI SQL by default, where division by zero / overflow / bad index
    * are runtime ERRORS — try_divide/try_add/try_multiply/try_element_at
    * are the null-on-error escape hatches a robust pipeline uses. The
    * oracle mirrors each null condition explicitly.
    */
  private val tryFuncs = QueryDef(
    "q_try_funcs",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_orderkey") < 50)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Ql.r(expr("try_divide(l_extendedprice, l_quantity - 25)"), 4)
            .as("div_or_null"),
          expr("try_add(9223372036854775807L, l_partkey)").as("add_overflow"),
          expr("try_multiply(9223372036854775807L, l_suppkey)")
            .as("mul_overflow"),
          // l_linenumber+1 spans in-range AND out-of-range indices, so a
          // cross-engine indexing divergence would actually show up
          expr("try_element_at(array(1, 2, 3), CAST(l_linenumber + 1 AS INT))")
            .as("elem_maybe"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity = 25 THEN NULL
                  ELSE ${Ql.R("l_extendedprice / (l_quantity - 25)", 4)} END AS div_or_null,
             CASE WHEN l_partkey > 0 THEN NULL
                  ELSE 9223372036854775807 END AS add_overflow,
             CASE WHEN l_suppkey = 0 THEN 0
                  WHEN l_suppkey = 1 THEN 9223372036854775807
                  ELSE NULL END AS mul_overflow,
             list_extract([1, 2, 3], l_linenumber + 1) AS elem_maybe
      FROM lineitem WHERE l_orderkey < 50
      ORDER BY l_orderkey, l_linenumber
    """))

  private val condNull = QueryDef(
    "q_cond_null",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .select(
          when(col("c_acctbal") < 0, "debtor")
            .when(col("c_acctbal") < 5000, "regular")
            .otherwise("premium").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(redacted)")).as("segment"),
          col("c_custkey"))
        .groupBy("tier", "segment")
        .agg(count(lit(1)).as("n"))
        .orderBy("tier", "segment"),
    Some("""
      SELECT CASE WHEN c_acctbal < 0 THEN 'debtor'
                  WHEN c_acctbal < 5000 THEN 'regular'
                  ELSE 'premium' END AS tier,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS segment,
             count(*) AS n
      FROM customer GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** G5: array functions over tokenized text. */
  private val arrayFuncs = QueryDef(
    "q_array_funcs",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 50)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          array_contains(col("toks"), "the").cast("int").as("has_the"),
          array_join(slice(col("toks"), 1, 3), " ").as("first3"),
          array_min(col("toks")).as("min_tok"),
          array_max(col("toks")).as("max_tok"),
          size(sequence(lit(1), (col("doc_id") % 5 + 1).cast("int"))).as("seq_len"),
          array_position(col("toks"), "the").cast("int").as("the_pos"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_toks,
             CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
             CAST(list_contains(toks, 'the') AS INT) AS has_the,
             array_to_string(toks[1:3], ' ') AS first3,
             list_min(toks) AS min_tok,
             list_max(toks) AS max_tok,
             CAST(len(generate_series(1, doc_id % 5 + 1)) AS INT) AS seq_len,
             CAST(coalesce(list_position(toks, 'the'), 0) AS INT) AS the_pos
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE doc_id < 50 ORDER BY doc_id
    """))

  /** G6: higher-order functions over embedding vectors (cast to double
    * first so both engines do identical double arithmetic in the fold).
    */
  private val hofFuncs = QueryDef(
    "q_hof_funcs",
    (spark, sfDir) =>
      Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 100)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .select(
          col("vec_id"),
          expr("size(filter(v, x -> x > 0))").as("n_pos"),
          Ql.r(expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"), 4).as("norm_sq"),
          Ql.r(expr("array_max(transform(v, x -> abs(x)))"), 4).as("max_abs"),
          expr("exists(v, x -> x > 0.3)").cast("int").as("has_big"),
          expr("forall(v, x -> abs(x) < 1.0)").cast("int").as("all_small"))
        .orderBy("vec_id"),
    Some(s"""
      SELECT vec_id,
             CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
             ${Ql.R("list_sum(list_transform(v, x -> x * x))", 4)} AS norm_sq,
             ${Ql.R("list_max(list_transform(v, x -> abs(x)))", 4)} AS max_abs,
             CAST(len(list_filter(v, x -> x > 0.3)) > 0 AS INT) AS has_big,
             CAST(len(list_filter(v, x -> abs(x) >= 1.0)) = 0 AS INT) AS all_small
      FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings)
      WHERE vec_id < 100 ORDER BY vec_id
    """))

  /** G7/G8: map functions over the parsed JSON payload. */
  private val mapFuncs = QueryDef(
    "q_map_funcs",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_entries"),
          element_at(expr("transform_values(m, (k, v) -> v * 2)"), "k").as("k_doubled"),
          size(expr("map_filter(m, (k, v) -> v > 50)")).as("n_big"),
          size(expr("map_concat(m, map('extra', -1))")).as("n_concat"),
          element_at(expr("map_from_entries(array(struct('kk', 7)))"), "kk").as("const_entry"),
          // map_entries order is map-internal — array_sort makes the
          // rendering deterministic ('a' < 'k' always)
          expr("""array_join(array_sort(transform(
                    map_entries(map_concat(m, map('a', 1))),
                    e -> concat(e.key, '=', e.value))), ',')""").as("entries_str"),
          expr("aggregate(map_values(map_concat(m, map('a', 1))), 0, (acc, x) -> acc + x)")
            .as("vals_sum"),
          element_at(expr(
            "map_zip_with(m, map('k', 10), (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))"),
            "k").as("k_plus10"))
        .filter(col("event_id") < 100)
        .orderBy("event_id"),
    Some("""
      SELECT event_id, 'k' AS keys, k AS k_val, 1 AS n_entries,
             k * 2 AS k_doubled,
             CAST(CASE WHEN k > 50 THEN 1 ELSE 0 END AS INT) AS n_big,
             2 AS n_concat, 7 AS const_entry,
             'a=1,k=' || CAST(k AS VARCHAR) AS entries_str,
             k + 1 AS vals_sum,
             k + 10 AS k_plus10
      FROM (SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events)
      WHERE event_id < 100 ORDER BY event_id
    """))

  override def defs: Seq[QueryDef] = Seq(
    strFuncs, strFuncs2, regexFuncs, dateFuncs, mathFuncs, tryFuncs, condNull,
    arrayFuncs, hofFuncs, mapFuncs)
}
