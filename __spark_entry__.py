"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``distributed_database_for_sql_spark/``; this file
just adapts the query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_database_for_sql_spark.queries import registry  # noqa: E402
from distributed_database_for_sql_spark.session import tune_for_oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analogue) on /root/testdata/sf0.001."""
    tune_for_oracle(spark)
    spec = registry()["q1_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in registry().items():
        def make(fn):  # bind loop var
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                tune_for_oracle(spark)
                return fn(spark, sf_dir)
            return run
        out[name] = make(spec.fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in registry().items()
            if spec.oracle is not None}
