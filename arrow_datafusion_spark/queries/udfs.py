"""UDF-surface suite (SURVEY.md §2.11): scalar UDF (row-at-a-time), Arrow-
vectorized pandas UDF, and a grouped UDAF via applyInPandas — registered
through SessionContext, used from SQL, oracle-compared to DuckDB.

Reference traits: ScalarUDFImpl udf.rs:328, AggregateUDFImpl udaf.rs:317,
partition_evaluator udwf.rs:251; core/tests/user_defined/.

The pandas UDF is the production path (Arrow batch transfer); the
row-at-a-time UDF exists for API parity and is kept off large inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_datafusion_spark.context import SessionContext
from arrow_datafusion_spark.session import load_tables


# --------------------------------------------------------------------------
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF: token count over Arrow batches."""
    ctx = SessionContext(spark)
    load_tables(spark, sf_dir, names=("documents",))

    # no type hints: pandas_udf would try to infer the signature from them
    # and we pass the return type explicitly at registration
    def py_token_count(s):
        return s.str.split().map(len).astype("int32")

    ctx.register_pandas_udf("py_token_count", py_token_count, "int")
    return ctx.sql("""
        SELECT doc_id, py_token_count(text) AS n_tokens
        FROM documents ORDER BY doc_id
    """)


UDF_PANDAS_SCALAR_SQL = r"""
SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar UDF (the slow path — API parity only)."""
    ctx = SessionContext(spark)
    load_tables(spark, sf_dir, names=("nation",))

    def parity(k) -> str:
        return "even" if k is not None and k % 2 == 0 else "odd"

    ctx.register_udf("py_parity", parity, "string")
    return ctx.sql("""
        SELECT n_nationkey, py_parity(n_nationkey) AS parity
        FROM nation ORDER BY n_nationkey
    """)


UDF_PYTHON_SCALAR_SQL = """
SELECT n_nationkey, CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
FROM nation ORDER BY n_nationkey
"""


# --------------------------------------------------------------------------
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas (the AggregateUDFImpl analog):
    per-language geometric mean of document length."""
    import math

    import pandas as pd

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["n_chars"].astype(float)
        g = math.exp(sum(math.log(v) for v in vals) / len(vals))
        return pd.DataFrame({"lang": [pdf["lang"].iloc[0]], "geo_chars": [round(g, 4)]})

    return (
        docs.groupBy("lang")
        .applyInPandas(geomean, "lang string, geo_chars double")
        .orderBy("lang")
    )


UDAF_GROUPED_SQL = """
SELECT lang, round(exp(sum(ln(CAST(n_chars AS DOUBLE))) / count(*)), 4) AS geo_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python table function (TableFunctionImpl analog) in a LATERAL join:
    one row per token with its position."""
    from pyspark.sql.functions import udtf

    ctx = SessionContext(spark)
    load_tables(spark, sf_dir, names=("documents",))

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield (w, i)

    ctx.register_udtf("split_words", SplitWords)
    return ctx.sql("""
        SELECT d.doc_id, t.pos, t.word
        FROM documents d, LATERAL split_words(d.text) t
        WHERE d.doc_id < 50
    """)


UDTF_LATERAL_SQL = """
SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[CAST(i AS INT)] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 50) t,
     (SELECT unnest(range(1, 200)) AS i) idx
WHERE i <= len(w)
"""


# --------------------------------------------------------------------------
def udwf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined WINDOW function (WindowUDFImpl / partition_evaluator,
    udwf.rs:251): a GROUPED_AGG pandas UDF evaluated .over() a bounded
    ROWS frame — PySpark's idiomatic UDWF surface. The function (midrange =
    (min+max)/2 of the trailing-3 frame) is deliberately not a builtin."""
    from pyspark.sql import Window
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    c = load_tables(spark, sf_dir, names=("customer",))["customer"]

    # explicit functionType: this module uses `from __future__ import
    # annotations`, which stringifies type hints and defeats pandas_udf's
    # Series -> float signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def midrange(v):
        return round((float(v.min()) + float(v.max())) / 2, 4)

    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_custkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        midrange(F.col("c_acctbal")).over(w).alias("bal_midrange"),
    )


UDWF_WINDOW_SQL = """
SELECT c_custkey, c_mktsegment,
       round((min(c_acctbal) OVER w + max(c_acctbal) OVER w) / 2, 4) AS bal_midrange
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "udf_pandas_scalar": udf_pandas_scalar,
    "udf_python_scalar": udf_python_scalar,
    "udaf_grouped": udaf_grouped,
    "udwf_window": udwf_window,
    "udtf_lateral": udtf_lateral,
}
ORACLE = {
    "udf_pandas_scalar": UDF_PANDAS_SCALAR_SQL,
    "udf_python_scalar": UDF_PYTHON_SCALAR_SQL,
    "udaf_grouped": UDAF_GROUPED_SQL,
    "udwf_window": UDWF_WINDOW_SQL,
    "udtf_lateral": UDTF_LATERAL_SQL,
}
