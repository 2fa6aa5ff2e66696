"""Scalar function families: string, date/time, math, conditional,
array (higher-order), JSON/map.

Reference parity (SURVEY.md §2.2/§2.6): streamz ``map(func)`` with an
arbitrary Python callable — here re-expressed as built-in Catalyst
expressions (the 100 TB rule: stay inside whole-stage codegen; a
Python UDF in the hot path costs 10-100x).

Cross-engine gotchas handled here:
- dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday (oracle adds 1);
- floor/ceil return LONG in Spark, DOUBLE in DuckDB (oracle casts);
- transcendentals (ln/log10/pow) can differ by 1 ulp between libm
  implementations -> compared through qround(.,6);
- engine-native round() differs near decimal ties -> qround;
- NTZ timestamps only ever hit timezone-independent functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import (
    dsum,
    qround,
    sql_dsum,
    sql_qround,
)
from streamz_postgres_spark.registry import register


@register(
    "q_str_funcs",
    oracle="""
SELECT
  doc_id,
  upper(lang) AS lang_up,
  substr(text, 1, 20) AS head20,
  lang || ':' || source AS lang_source,
  trim('  ' || lang || '  ') AS lang_trim,
  length(text) AS text_len,
  length(replace(text, 'select', '@')) AS replaced_len,
  len(string_split(text, ' ')) AS n_tokens,
  regexp_extract(text, '([a-z]+)', 1) AS first_word,
  CAST(text LIKE '%select%' AS INTEGER) AS has_select
FROM documents
""",
    tags=("scalar", "string"),
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, concat, trim, length, replace,
    split, regexp_extract, LIKE."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 20).alias("head20"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
        F.length("text").alias("text_len"),
        F.length(F.replace(F.col("text"), F.lit("select"), F.lit("@"))).alias(
            "replaced_len"
        ),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.col("text").like("%select%").cast("int").alias("has_select"),
    )


@register(
    "q_str_funcs2",
    oracle="""
SELECT
  doc_id,
  lpad(lang, 5, '*') AS lang_pad,
  rpad(source, 8, '.') AS src_pad,
  reverse(lang) AS lang_rev,
  translate(lang, 'en', 'EN') AS lang_tr,
  length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
  CAST(starts_with(text, 'select') AS INTEGER) AS starts_select,
  CAST(suffix(source, '1') AS INTEGER) AS src_ends_1,
  CAST(contains(text, 'hash join') AS INTEGER) AS has_hashjoin,
  repeat(lang, 2) AS lang_x2,
  left(text, 8) AS head8,
  right(text, 8) AS tail8,
  levenshtein(substr(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'), 1, 10),
              'select the') AS lev_to_probe
FROM documents
""",
    tags=("scalar", "string"),
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: padding, reverse, translate, global
    regexp_replace, prefix/suffix/contains predicates, repeat,
    left/right, and Levenshtein edit distance (the fuzzy-matching
    primitive fuzzy dedup pipelines use for short fields)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad("lang", 5, "*").alias("lang_pad"),
        F.rpad("source", 8, ".").alias("src_pad"),
        F.reverse("lang").alias("lang_rev"),
        F.translate("lang", "en", "EN").alias("lang_tr"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("novowel_len"),
        F.startswith(F.col("text"), F.lit("select")).cast("int").alias(
            "starts_select"
        ),
        F.endswith(F.col("source"), F.lit("1")).cast("int").alias("src_ends_1"),
        F.contains(F.col("text"), F.lit("hash join")).cast("int").alias(
            "has_hashjoin"
        ),
        F.repeat(F.col("lang"), 2).alias("lang_x2"),
        F.substring("text", 1, 8).alias("head8"),
        # F.right, not substr(length-7): for strings shorter than 8
        # chars a negative substr start counts from the END in Spark,
        # while the oracle's right() returns the whole string
        F.right(F.col("text"), F.lit(8)).alias("tail8"),
        # ASCII-fold before the edit distance: DuckDB's levenshtein
        # counts BYTES (levenshtein('é','e') = 2) while Spark counts
        # code points — parity on non-ASCII text requires an
        # ASCII-only input, and '?'-folding keeps the fuzzy-match
        # purpose intact (v2 hostile-fixture find, unicode class)
        F.levenshtein(
            F.substring(
                F.regexp_replace("text", r"[^\x00-\x7F]", "?"), 1, 10
            ),
            F.lit("select the"),
        ).alias("lev_to_probe"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate) AS yr,
  month(o_orderdate) AS mo,
  day(o_orderdate) AS dy,
  quarter(o_orderdate) AS qtr,
  dayofweek(o_orderdate) + 1 AS dow,
  weekofyear(o_orderdate) AS iso_week,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
  STRFTIME(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
  STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders
""",
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (all timezone-independent on NTZ inputs).
    dayofweek aligned: Spark 1=Sunday vs DuckDB 0=Sunday."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        # trunc() on DATE is tz-free; date_trunc on NTZ would cast
        # through TimestampType with the session timezone
        F.trunc(F.col("o_orderdate").cast("date"), "month")
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format(
            F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(
            F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd"
        ).alias("month_end"),
    )


@register(
    "q_math_funcs",
    oracle=f"""
SELECT
  p_partkey,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
  ABS(p_size - 25) AS size_dev,
  SQRT(ABS(p_retailprice)) AS price_sqrt,
  p_retailprice * p_retailprice AS price_sq,
  p_partkey % 7 AS key_mod,
  CAST(SIGN(p_size - 25) AS DOUBLE) AS size_sign,
  ROUND(p_size / 2.0) AS half_size,
  {sql_qround('LN(NULLIF(ABS(p_retailprice), 0))', 6)} AS price_ln,
  {sql_qround('LOG10(NULLIF(ABS(p_retailprice), 0))', 6)} AS price_log10,
  {sql_qround('POW(ABS(p_retailprice), 1.5)', 6)} AS price_pow
FROM part
""",
    tags=("scalar", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Exact IEEE ops compared raw; transcendentals
    through qround(.,6); round() only where ties are exact halves
    (int/2.0) so HALF_UP and half-away agree. SQRT/LN/LOG10/POW go
    through an ABS() DOMAIN GUARD: on a negative input (refund-class
    monies) DuckDB HARD-ERRORS on sqrt/ln while Spark returns
    NaN/NULL — guarding the domain keeps the transcendental exercise
    value-checked under any sign (hostile-sweep v3 find). LN/LOG10
    additionally NULLIF the zero (r12 advisor, medium): DuckDB
    hard-errors on ln(0)/log10(0) ('cannot take logarithm of zero')
    where Spark's log returns NULL, so an exactly-zero retailprice
    keys the row's log columns NULL on both sides instead of killing
    the oracle."""
    p = load_table(spark, sf_dir, "part")
    ln_arg = F.nullif(F.abs(F.col("p_retailprice")), F.lit(0))
    return p.select(
        "p_partkey",
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.sqrt(F.abs(F.col("p_retailprice"))).alias("price_sqrt"),
        (F.col("p_retailprice") * F.col("p_retailprice")).alias("price_sq"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.signum(F.col("p_size") - 25).alias("size_sign"),
        F.round(F.col("p_size") / 2.0).alias("half_size"),
        qround(F.log(ln_arg), 6).alias("price_ln"),
        qround(F.log10(ln_arg), 6).alias("price_log10"),
        qround(
            F.pow(F.abs(F.col("p_retailprice")), 1.5), 6
        ).alias("price_pow"),
    )


@register(
    "q_cond_funcs",
    oracle="""
SELECT
  c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'low'
       WHEN c_acctbal < 8000 THEN 'mid'
       ELSE 'high' END AS bal_tier,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
  greatest(c_acctbal, 0.0) AS bal_pos,
  least(c_acctbal, 1000.0) AS bal_capped,
  CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END AS signed_bal
FROM customer
""",
    tags=("scalar", "cond"),
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce, nullif, greatest,
    least."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
        .otherwise(-F.col("c_acctbal"))
        .alias("signed_bal"),
    )


@register(
    "q_array_funcs",
    oracle="""
SELECT
  vec_id,
  len(embedding) AS dim,
  array_to_string(list_transform(embedding[1:4],
                  x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                            AS VARCHAR)), ',') AS head4,
  len(list_filter(embedding, x -> x > 0)) AS n_pos,
  -- NULL guard: DuckDB's list_prepend(0.0, NULL) is [0.0], folding a
  -- NULL array to 0.0 where Spark's aggregate(NULL) is NULL (v2
  -- hostile-fixture find, NULL-embedding class)
  CASE WHEN embedding IS NULL THEN NULL ELSE
  list_reduce(list_prepend(0.0, list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (acc, x) -> acc + x) END AS norm_sq,
  CAST(list_sort(embedding)[1] AS DOUBLE) AS min_dim
FROM embeddings
""",
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order family: size, slice, transform, filter,
    aggregate (left fold — both engines fold sequentially so double
    addition order matches), sort. Lambdas run inside codegen, not
    Python.

    ``head4`` is serialized at the edge (integer micro-units joined
    with commas) because raw ARRAY output columns crash independent
    hashers ("unhashable type: 'list'", round-2 driver ERR) and
    double->string formatting differs between engines (Java "9.9E-5"
    vs DuckDB "9.9e-05"); floor()+BIGINT is bit-identical on both."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.floor(x.cast("double") * 1000000)
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("head4"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x).alias("norm_sq"),
        F.element_at(F.sort_array("embedding"), 1).cast("double").alias("min_dim"),
    )


@register(
    "q_variant",
    oracle=f"""
WITH ext AS (
  SELECT TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS INTEGER) AS k,
         value
  FROM events
)
SELECT k, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM ext WHERE k >= 50
GROUP BY 1
""",
    tags=("scalar", "json", "variant"),
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse_json -> variant column ->
    variant_get typed extraction (the reference's json/jsonb mapping,
    SURVEY §1.2). Variant keeps a binary-encoded document, so at
    100 TB repeated extractions skip per-path string re-parsing.

    try_parse_json, not parse_json: real metadata columns carry
    malformed documents, and parse_json HARD-ERRORS on them where
    the try_ form yields a NULL variant (and DuckDB's json functions
    hard-error too — the oracle guards with json_valid and TRY_CAST;
    hostile-sweep v4 find). variant_get COERCES a string-typed
    number ("42" -> 42), which TRY_CAST(json_extract_string)
    mirrors; a non-scalar extracts as NULL on both engines."""
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("pv", F.try_parse_json("props"))
    return (
        v.withColumn("k", F.try_variant_get("pv", "$.k", "int"))
        .filter(F.col("k") >= 50)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


@register(
    "q_map_json_funcs",
    oracle=f"""
SELECT
  TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                AND json_type(json_extract(props, '$.k'))
                    IN ('UBIGINT', 'BIGINT')
           THEN json_extract_string(props, '$.k') END
           AS INTEGER) AS k,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1
""",
    tags=("scalar", "json"),
)
def q_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family on the events.props payload: parse with a declared
    schema (from_json), extract, group. At scale from_json with an
    explicit schema beats per-path get_json_object re-parsing; both
    stay JVM-side. A map roundtrip (create_map -> element access)
    exercises MapType on the same value.

    from_json with a declared schema is STRICT: a malformed
    document, a string-typed number ("42"), or a non-scalar all
    yield NULL for the field — so the oracle only casts when
    json_valid AND the extracted json_type is integral
    (UBIGINT/BIGINT), mirroring the no-coercion contract
    (hostile-sweep v4 find; DuckDB json functions hard-error on
    invalid JSON, and bare CAST of an extracted '[1,2,3]' errors
    too — hence the json_valid guard plus TRY_CAST)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.withColumn("m", F.create_map(F.lit("k"), F.col("p.k")))
        .withColumn("k", F.col("m")["k"])
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )
