"""UDF surface: vectorized scalar Pandas UDF, grouped-agg Pandas UDF,
grouped-map applyInPandas (SURVEY.md §2.C "UDF / UDAF / UDTF").

UDFs are the deliberate slow path (opaque to Catalyst — no pushdown
through them, no codegen inside): every query here exists to prove the
Arrow-batched machinery works and stays correct, while the equivalent
built-in expression remains the recommendation.  The oracle recomputes
each result in pure SQL, which doubles as the proof that the UDF output
matches the declarative form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .base import register


@F.pandas_udf(T.DoubleType())
def _net_price(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: whole Arrow batches in, one vector op out."""
    return extended * (1.0 - discount) * (1.0 + tax)


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS net_price
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow-vectorized) computing net price per line."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.round(
                _net_price("l_extendedprice", "l_discount", "l_tax"), 2
            ).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@F.pandas_udf(T.DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-agg Pandas UDF (UDAF): one scalar per group."""
    return float((price * qty).sum() / qty.sum())


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("udf", "udaf", "pandas"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF: quantity-weighted average price."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                _weighted_avg_price("l_extendedprice", "l_quantity"), 4
            ).alias("w_avg_price")
        )
        .orderBy("l_returnflag")
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / NULLIF(STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_nationkey), 0),
                 4) AS acctbal_z
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("udf", "grouped-map", "pandas"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score account balance within nation.

    Arrow ships each nation's rows to Python as one pdf; at 100 TB group
    sizes (not group count) bound memory — nation-sized groups are fine,
    and the window-function formulation (the oracle) is the JVM-only
    alternative when they're not."""
    cust = load_table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["c_acctbal"].std(ddof=1)
        z = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / std if std else None
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "acctbal_z": z.round(4) if std else pd.Series([None] * len(pdf)),
            }
        )

    return (
        cust.groupBy("c_nationkey")
        .applyInPandas(zscore, "c_custkey long, c_nationkey int, acctbal_z double")
        .orderBy("c_custkey")
    )


@register(
    "udtf_tokenize_positions",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id, pos
    """,
    tags=("udtf", "lateral", "text"),
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: one (token, pos) row per input token.

    The table-function surface (SURVEY.md §2.C "UDTF"): arbitrary
    row-expanding Python logic addressable from SQL.  For pure splitting
    posexplode is the JVM-native fast path (and is what the oracle
    mirrors); the UDTF form is the template for expansions that need real
    Python (parsers, tokenizers, model featurizers).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: long")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield tok, i

    spark.udtf.register("tokenize_positions", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL tokenize_positions(d.text) t
        WHERE d.doc_id < 100
        ORDER BY d.doc_id, t.pos
    """)


@F.pandas_udf(T.LongType())
def _cents_sum(price: pd.Series) -> int:
    """Window-applied Pandas UDAF: exact cents total of the frame.

    floor(x*100 + 0.5), not Python round(): round() is banker's
    (half-even) while the DuckDB oracle's ROUND is half-away-from-zero —
    the repo-wide floor-quantize convention removes the tie-mode
    divergence for any future true .5 boundary."""
    import math

    return int(math.floor(float(price.sum()) * 100 + 0.5))


@register(
    "udf_pandas_over_window",
    # The UDAF runs once per (row, frame); a trailing 3-row frame over a
    # unique order is engine-deterministic, and the cents conversion
    # keeps the hash integer-exact.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(SUM(l_extendedprice) OVER w * 100 + 0.5) AS BIGINT)
             AS trail3_cents
    FROM lineitem
    WHERE l_orderkey <= 200
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf", "udaf", "window", "pandas"),
)
def udf_pandas_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF applied OVER A WINDOW FRAME (the fourth pandas-UDF
    mode beyond scalar / grouped-agg / grouped-map): a trailing 3-row
    price total per order line.  Spark ships each bounded frame to the
    UDAF through Arrow; the oracle recomputes the frame with plain SQL
    SUM — proving the custom aggregate sees exactly the frame rows."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") <= 200)
    w = (W.partitionBy("l_orderkey").orderBy("l_linenumber")
         .rowsBetween(-2, W.currentRow))
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            _cents_sum("l_extendedprice").over(w).alias("trail3_cents"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
