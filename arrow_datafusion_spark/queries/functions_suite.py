"""Scalar-function suite: one driver CORRECTNESS entry per §2.9 family, each
exercising the SCALAR registry (arrow_datafusion_spark/functions/scalar.py)
against a DuckDB oracle over the same parquet fixtures.

Mirrors the reference's sqllogictest strategy (SURVEY.md §5): the engine's
function output is hash-compared to a trusted oracle per family — the slt
corpus' functions.slt / string.slt / math.slt / timestamps.slt / array.slt
equivalents, collapsed into per-family wide projections.

Determinism rules used throughout:
- every row is keyed (doc_id / event_id) so compares are order-insensitive;
- float-valued math funcs are rounded to 6 decimals on BOTH sides so libm
  last-ulp differences between the JVM and DuckDB can't flip the value hash;
- arguments are kept inside each function's well-conditioned domain (no tan
  poles, no exp overflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_datafusion_spark.functions.scalar import SCALAR as S
from arrow_datafusion_spark.session import load_tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("documents",))["documents"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("events",))["events"]


# --------------------------------------------------------------------------
# string (string/mod.rs:48-73)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    text, lang, source = F.col("text"), F.col("lang"), F.col("source")
    return d.select(
        "doc_id",
        S["ascii"](text).alias("a_ascii"),
        S["bit_length"](lang).alias("a_bitlen"),
        S["btrim"](S["concat"](F.lit("xx"), lang, F.lit("xx")), F.lit("x")).alias("a_btrim"),
        S["chr"]((F.col("doc_id") % 26 + 65).cast("int")).alias("a_chr"),
        S["concat"](lang, F.lit("|"), source).alias("a_concat"),
        S["concat_ws"]("-", lang, source).alias("a_cws"),
        S["contains"](text, F.lit("scan")).alias("a_contains"),
        S["ends_with"](source, F.lit("1")).alias("a_ends"),
        S["levenshtein"](lang, F.lit("en")).alias("a_leven"),
        S["lower"](S["upper"](lang)).alias("a_lower"),
        S["ltrim"](S["concat"](F.lit("  "), lang)).alias("a_ltrim"),
        S["rtrim"](S["concat"](lang, F.lit("  "))).alias("a_rtrim"),
        S["octet_length"](text).alias("a_octet"),
        S["repeat"](lang, F.lit(3)).alias("a_repeat"),
        S["replace"](source, F.lit("src"), F.lit("S")).alias("a_replace"),
        S["split_part"](text, F.lit(" "), F.lit(3)).alias("a_split"),
        S["starts_with"](text, F.lit("key")).alias("a_starts"),
        S["to_hex"](F.col("doc_id")).alias("a_hex"),
    )


FN_STRING_SQL = """
SELECT doc_id,
       ascii(text) AS a_ascii,
       bit_length(lang) AS a_bitlen,
       trim('xx' || lang || 'xx', 'x') AS a_btrim,
       chr(CAST(doc_id % 26 + 65 AS INT)) AS a_chr,
       lang || '|' || source AS a_concat,
       concat_ws('-', lang, source) AS a_cws,
       contains(text, 'scan') AS a_contains,
       ends_with(source, '1') AS a_ends,
       levenshtein(lang, 'en') AS a_leven,
       lower(upper(lang)) AS a_lower,
       ltrim('  ' || lang) AS a_ltrim,
       rtrim(lang || '  ') AS a_rtrim,
       octet_length(text::BLOB) AS a_octet,
       repeat(lang, 3) AS a_repeat,
       replace(source, 'src', 'S') AS a_replace,
       split_part(text, ' ', 3) AS a_split,
       starts_with(text, 'key') AS a_starts,
       to_hex(doc_id) AS a_hex
FROM documents
"""


# --------------------------------------------------------------------------
# unicode (unicode/)
def fn_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    text, lang, source = F.col("text"), F.col("lang"), F.col("source")
    return d.select(
        "doc_id",
        S["character_length"](text).alias("u_charlen"),
        S["find_in_set"](lang, F.lit("en,fr,de,es")).alias("u_fis"),
        S["left"](text, F.lit(10)).alias("u_left"),
        S["right"](text, F.lit(10)).alias("u_right"),
        S["lpad"](lang, F.lit(6), "*").alias("u_lpad"),
        S["rpad"](lang, F.lit(6), "#").alias("u_rpad"),
        S["reverse"](source).alias("u_rev"),
        S["strpos"](text, F.lit("table")).alias("u_strpos"),
        S["substr"](text, F.lit(5), F.lit(12)).alias("u_substr"),
        S["substr_index"](text, " ", 4).alias("u_subidx"),
        S["translate"](source, "srcx", "SRC*").alias("u_translate"),
    )


FN_UNICODE_SQL = """
SELECT doc_id,
       length(text) AS u_charlen,
       coalesce(list_position(string_split('en,fr,de,es', ','), lang), 0) AS u_fis,
       left(text, 10) AS u_left,
       right(text, 10) AS u_right,
       lpad(lang, 6, '*') AS u_lpad,
       rpad(lang, 6, '#') AS u_rpad,
       reverse(source) AS u_rev,
       strpos(text, 'table') AS u_strpos,
       substring(text, 5, 12) AS u_substr,
       array_to_string((string_split(text, ' '))[1:4], ' ') AS u_subidx,
       translate(source, 'srcx', 'SRC*') AS u_translate
FROM documents
"""


# --------------------------------------------------------------------------
# regex (regex/)
#
# Array-valued outputs (regexp_extract_all here; most of fn_array below) are
# serialized to '|'-joined strings on BOTH sides: the driver's canonicalizer
# hashes cell values via pandas factorize, which cannot hash ndarray cells.
# The underlying function still returns a real ARRAY — only the test
# projection flattens it.
def _aj(col) -> F.Column:
    return F.array_join(col.cast("array<string>"), "|")


def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    text, lang = F.col("text"), F.col("lang")
    return d.select(
        "doc_id",
        S["regexp_like"](text, "^key").alias("r_like"),
        S["regexp_match"](text, "[a-z]+e").alias("r_match"),
        _aj(S["regexp_extract_all"](text, F.lit("ta[a-z]+"))).alias("r_all"),
        S["regexp_replace"](text, "a", "@").alias("r_repl"),
        S["regexp_count"](text, F.lit("scan")).alias("r_count"),
        S["regexp_like"](S["upper"](lang), "en", "i").alias("r_casei"),
    )


FN_REGEX_SQL = """
SELECT doc_id,
       regexp_matches(text, '^key') AS r_like,
       coalesce(regexp_extract(text, '[a-z]+e'), '') AS r_match,
       coalesce(array_to_string(regexp_extract_all(text, 'ta[a-z]+'), '|'), '') AS r_all,
       regexp_replace(text, 'a', '@', 'g') AS r_repl,
       len(regexp_extract_all(text, 'scan')) AS r_count,
       regexp_matches(upper(lang), '(?i)en') AS r_casei
FROM documents
"""


# --------------------------------------------------------------------------
# datetime (datetime/mod.rs:268-287)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    ts = F.col("ts")
    return e.select(
        "event_id",
        S["date_part"]("year", ts).cast("bigint").alias("d_year"),
        S["date_part"]("month", ts).cast("bigint").alias("d_month"),
        S["date_part"]("hour", ts).cast("bigint").alias("d_hour"),
        S["date_trunc"]("day", ts).alias("d_trunc_day"),
        S["date_trunc"]("hour", ts).alias("d_trunc_hour"),
        S["date_bin"]("15 minutes", ts).alias("d_bin15"),
        S["to_unixtime"](ts).alias("d_unix"),
        S["to_char"](ts, "yyyy-MM-dd HH:mm").alias("d_fmt"),
        S["make_date"](
            F.lit(2024),
            S["date_part"]("month", ts).cast("int"),
            S["date_part"]("day", ts).cast("int"),
        ).alias("d_mkdate"),
        S["to_timestamp_seconds"](F.col("event_id") + 1500000000).alias("d_ts_s"),
        S["to_timestamp_millis"](F.col("event_id") + 1500000000000).alias("d_ts_ms"),
        S["to_date"](ts).alias("d_date"),
    )


FN_DATETIME_SQL = """
SELECT event_id,
       CAST(date_part('year', ts) AS BIGINT) AS d_year,
       CAST(date_part('month', ts) AS BIGINT) AS d_month,
       CAST(date_part('hour', ts) AS BIGINT) AS d_hour,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS d_trunc_day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS d_trunc_hour,
       time_bucket(INTERVAL '15 minutes', ts, TIMESTAMP '1970-01-01') AS d_bin15,
       CAST(floor(epoch(ts)) AS BIGINT) AS d_unix,
       strftime(ts, '%Y-%m-%d %H:%M') AS d_fmt,
       make_date(2024, CAST(date_part('month', ts) AS INT),
                 CAST(date_part('day', ts) AS INT)) AS d_mkdate,
       make_timestamp((event_id + 1500000000) * 1000000) AS d_ts_s,
       make_timestamp((event_id + 1500000000000) * 1000) AS d_ts_ms,
       CAST(ts AS DATE) AS d_date
FROM events
"""


# --------------------------------------------------------------------------
# math (math/mod.rs:135-175) — transcendentals rounded to 6dp on both sides
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = F.col("value")
    eid = F.col("event_id")
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return e.select(
        "event_id",
        S["abs"](v - 245.0).alias("m_abs"),
        S["ceil"](v).cast("bigint").alias("m_ceil"),
        S["floor"](v).cast("bigint").alias("m_floor"),
        S["round"](v / 7, 3).alias("m_round3"),
        S["trunc"](v).alias("m_trunc"),
        r6(S["exp"](v / 100)).alias("m_exp"),
        # +1 shift: value has true zeros (first seen at sf0.1) — log(0) is
        # NULL on Spark but an Out-of-Range ERROR on DuckDB, so the bare
        # column can never be oracle-compared.
        r6(S["ln"](v + 1)).alias("m_ln"),
        r6(S["log10"](v + 1)).alias("m_log10"),
        r6(S["log2"](v + 1)).alias("m_log2"),
        r6(S["sqrt"](v)).alias("m_sqrt"),
        r6(S["cbrt"](v)).alias("m_cbrt"),
        r6(S["power"](v / 100, 3)).alias("m_pow"),
        r6(S["sin"](v)).alias("m_sin"),
        r6(S["cos"](v)).alias("m_cos"),
        r6(S["tan"](v / 1000)).alias("m_tan"),
        r6(S["cot"](v / 1000 + 0.5)).alias("m_cot"),
        r6(S["atan"](v)).alias("m_atan"),
        r6(S["atan2"](v, F.lit(7.0))).alias("m_atan2"),
        r6(S["asin"](v / 1000)).alias("m_asin"),
        r6(S["acos"](v / 1000)).alias("m_acos"),
        r6(S["sinh"](v / 100)).alias("m_sinh"),
        r6(S["cosh"](v / 100)).alias("m_cosh"),
        r6(S["tanh"](v / 100)).alias("m_tanh"),
        r6(S["asinh"](v / 100)).alias("m_asinh"),
        r6(S["acosh"](v / 100 + 1)).alias("m_acosh"),
        r6(S["atanh"](v / 1000)).alias("m_atanh"),
        r6(S["degrees"](v / 100)).alias("m_deg"),
        r6(S["radians"](v)).alias("m_rad"),
        S["signum"](v - 245.0).alias("m_sign"),
        S["factorial"]((eid % 10).cast("int")).cast("bigint").alias("m_fact"),
        S["gcd"](eid, F.lit(12)).alias("m_gcd"),
        S["lcm"](eid % 100, F.lit(12)).alias("m_lcm"),
        S["iszero"](v - v).alias("m_iszero"),
        S["isnan"](v).alias("m_isnan"),
        S["pi"]().alias("m_pi"),
    )


FN_MATH_SQL = """
SELECT event_id,
       abs(value - 245.0) AS m_abs,
       CAST(ceil(value) AS BIGINT) AS m_ceil,
       CAST(floor(value) AS BIGINT) AS m_floor,
       round(value / 7, 3) AS m_round3,
       trunc(value)::DOUBLE AS m_trunc,
       round(exp(value / 100), 6) AS m_exp,
       round(ln(value + 1), 6) AS m_ln,
       round(log10(value + 1), 6) AS m_log10,
       round(log2(value + 1), 6) AS m_log2,
       round(sqrt(value), 6) AS m_sqrt,
       round(cbrt(value), 6) AS m_cbrt,
       round(pow(value / 100, 3), 6) AS m_pow,
       round(sin(value), 6) AS m_sin,
       round(cos(value), 6) AS m_cos,
       round(tan(value / 1000), 6) AS m_tan,
       round(cot(value / 1000 + 0.5), 6) AS m_cot,
       round(atan(value), 6) AS m_atan,
       round(atan2(value, 7.0), 6) AS m_atan2,
       round(asin(value / 1000), 6) AS m_asin,
       round(acos(value / 1000), 6) AS m_acos,
       round((exp(value/100) - exp(-value/100)) / 2, 6) AS m_sinh,
       round((exp(value/100) + exp(-value/100)) / 2, 6) AS m_cosh,
       round((exp(value/50) - 1) / (exp(value/50) + 1), 6) AS m_tanh,
       round(ln(value/100 + sqrt((value/100)*(value/100) + 1)), 6) AS m_asinh,
       round(ln(value/100 + 1 + sqrt((value/100 + 1)*(value/100 + 1) - 1)), 6) AS m_acosh,
       round(0.5 * ln((1 + value/1000) / (1 - value/1000)), 6) AS m_atanh,
       round(degrees(value / 100), 6) AS m_deg,
       round(radians(value), 6) AS m_rad,
       sign(value - 245.0)::DOUBLE AS m_sign,
       CAST(factorial(CAST(event_id % 10 AS INT)) AS BIGINT) AS m_fact,
       gcd(event_id, 12) AS m_gcd,
       lcm(event_id % 100, 12) AS m_lcm,
       (value - value) = 0.0 AS m_iszero,
       isnan(value) AS m_isnan,
       pi() AS m_pi
FROM events
"""


# --------------------------------------------------------------------------
# core / conditional (core/)
def fn_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    et = F.col("event_type")
    return e.select(
        "event_id",
        S["coalesce"](S["nullif"](et, F.lit("click")), F.lit("other")).alias("c_coalesce"),
        S["nvl"](S["nullif"](et, F.lit("view")), F.lit("n/a")).alias("c_nvl"),
        S["nvl2"](
            S["nullif"](et, F.lit("click")), F.lit("not_click"), F.lit("is_click")
        ).alias("c_nvl2"),
        S["get_field"](F.from_json(F.col("props"), "k INT"), "k").alias("c_json_k"),
    )


FN_CORE_SQL = """
SELECT event_id,
       coalesce(nullif(event_type, 'click'), 'other') AS c_coalesce,
       ifnull(nullif(event_type, 'view'), 'n/a') AS c_nvl,
       CASE WHEN nullif(event_type, 'click') IS NOT NULL
            THEN 'not_click' ELSE 'is_click' END AS c_nvl2,
       CAST(json_extract_string(props, '$.k') AS INT) AS c_json_k
FROM events
"""


# --------------------------------------------------------------------------
# crypto / encoding (crypto/, encoding/)
def fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    text, lang = F.col("text"), F.col("lang")
    return d.select(
        "doc_id",
        S["md5"](text).alias("h_md5"),
        S["sha256"](text).alias("h_sha256"),
        S["digest"](lang, "md5").alias("h_digest"),
        S["encode"](lang, "hex").alias("h_hex"),
        S["encode"](text, "base64").alias("h_b64"),
    )


FN_CRYPTO_SQL = """
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       md5(lang) AS h_digest,
       lower(hex(lang)) AS h_hex,
       base64(text::BLOB) AS h_b64
FROM documents
"""


# --------------------------------------------------------------------------
# array (functions-array/src/lib.rs:60-135) — over split(text)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    words = S["string_to_array"](F.col("text"), " ")
    w5 = S["array_slice"](words, F.lit(1), F.lit(5))
    return d.select(
        "doc_id",
        S["array_length"](words).alias("l_len"),
        S["cardinality"](words).alias("l_card"),
        S["array_element"](words, F.lit(2)).alias("l_elem2"),
        S["array_contains"](words, F.lit("the")).alias("l_has_the"),
        S["array_position"](words, F.lit("the")).cast("bigint").alias("l_pos_the"),
        _aj(S["array_sort"](S["array_distinct"](w5))).alias("l_dedup_sorted"),
        _aj(S["array_reverse"](w5)).alias("l_rev"),
        _aj(S["array_slice"](words, F.lit(2), F.lit(4))).alias("l_slice"),
        _aj(S["array_append"](w5, F.lit("zz"))).alias("l_append"),
        _aj(S["array_prepend"](F.lit("aa"), w5)).alias("l_prepend"),
        _aj(S["array_concat"](w5, S["array_slice"](words, F.lit(6), F.lit(7)))).alias("l_concat"),
        _aj(S["array_repeat"](F.col("lang"), F.lit(3))).alias("l_repeat"),
        _aj(S["array_remove_all"](w5, F.lit("a"))).alias("l_remove_all"),
        _aj(S["array_pop_back"](w5)).alias("l_pop_back"),
        _aj(S["array_pop_front"](w5)).alias("l_pop_front"),
        S["array_to_string"](w5, "-").alias("l_join"),
        S["array_empty"](words).alias("l_empty"),
        _aj(
            S["flatten"](
                F.array(S["array_slice"](words, F.lit(1), F.lit(2)), S["array_slice"](words, F.lit(3), F.lit(4)))
            )
        ).alias("l_flat"),
        _aj(S["generate_series"](F.lit(1), (F.col("doc_id") % 5 + 1).cast("int"))).alias("l_series"),
    )


FN_ARRAY_SQL = """
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       len(words) AS l_len,
       len(words) AS l_card,
       words[2] AS l_elem2,
       list_contains(words, 'the') AS l_has_the,
       -- reference semantics (position.rs): NULL when not found; DuckDB's
       -- list_position returns 0 there, so nullif expresses the reference
       CAST(nullif(list_position(words, 'the'), 0) AS BIGINT) AS l_pos_the,
       array_to_string(list_sort(list_distinct(words[1:5])), '|') AS l_dedup_sorted,
       array_to_string(list_reverse(words[1:5]), '|') AS l_rev,
       array_to_string(words[2:4], '|') AS l_slice,
       array_to_string(list_append(words[1:5], 'zz'), '|') AS l_append,
       array_to_string(list_prepend('aa', words[1:5]), '|') AS l_prepend,
       array_to_string(list_concat(words[1:5], words[6:7]), '|') AS l_concat,
       array_to_string([lang for i in range(3)], '|') AS l_repeat,
       array_to_string(list_filter(words[1:5], x -> x != 'a'), '|') AS l_remove_all,
       array_to_string(words[1:len(words[1:5]) - 1], '|') AS l_pop_back,
       array_to_string(words[2:5], '|') AS l_pop_front,
       array_to_string(words[1:5], '-') AS l_join,
       len(words) = 0 AS l_empty,
       array_to_string(list_concat(words[1:2], words[3:4]), '|') AS l_flat,
       array_to_string(range(1, CAST(doc_id % 5 + 2 AS INT)), '|') AS l_series
FROM w
"""


# --------------------------------------------------------------------------
# map (functions-nested/src/map*.rs) — constructed from document fields;
# map-typed intermediates are reduced to scalar/string outputs for hashing
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    m = S["map"](
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    m2 = S["make_map"](F.lit("id2"), (F.col("doc_id") * 2).cast("string"))
    return d.select(
        "doc_id",
        _aj(S["map_keys"](m)).alias("p_keys"),
        _aj(S["map_values"](m)).alias("p_vals"),
        _aj(S["map_extract"](m, "lang")).alias("p_lang"),
        _aj(S["map_extract"](m, "missing")).alias("p_missing"),
        _aj(S["map_values"](m2)).alias("p_id2"),
        F.size(S["map_entries"](m)).alias("p_n"),
    )


FN_MAP_SQL = """
WITH w AS (SELECT doc_id, map(['lang','source'], [lang, source]) AS m,
                  map(['id2'], [CAST(doc_id * 2 AS VARCHAR)]) AS m2
           FROM documents)
SELECT doc_id,
       array_to_string(map_keys(m), '|') AS p_keys,
       array_to_string(map_values(m), '|') AS p_vals,
       array_to_string(map_extract(m, 'lang'), '|') AS p_lang,
       coalesce(array_to_string(map_extract(m, 'missing'), '|'), '') AS p_missing,
       array_to_string(map_values(m2), '|') AS p_id2,
       cardinality(m) AS p_n
FROM w
"""


QUERIES = {
    "fn_string": fn_string,
    "fn_map": fn_map,
    "fn_unicode": fn_unicode,
    "fn_regex": fn_regex,
    "fn_datetime": fn_datetime,
    "fn_math": fn_math,
    "fn_core": fn_core,
    "fn_crypto": fn_crypto,
    "fn_array": fn_array,
}
ORACLE = {
    "fn_string": FN_STRING_SQL,
    "fn_map": FN_MAP_SQL,
    "fn_unicode": FN_UNICODE_SQL,
    "fn_regex": FN_REGEX_SQL,
    "fn_datetime": FN_DATETIME_SQL,
    "fn_math": FN_MATH_SQL,
    "fn_core": FN_CORE_SQL,
    "fn_crypto": FN_CRYPTO_SQL,
    "fn_array": FN_ARRAY_SQL,
}
