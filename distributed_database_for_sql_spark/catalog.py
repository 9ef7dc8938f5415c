"""Table registry over the parquet test data.

The reference's only data abstraction is an in-memory log of opaque command
strings (/root/reference/src/raft/node.go:16-28); the relational model those
commands imply is a set of named tables.  Here a "database" is a directory of
parquet files (one per table); loading is a metadata-only operation (schema
from parquet footers) and registration exposes each table to both the
DataFrame API and `spark.sql`.

At 100 TB each table would be a partitioned/bucketed parquet (or
lakehouse-format) root instead of a single file — the API is identical,
`spark.read.parquet(root)` with partition pruning; nothing here assumes
single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes physical-type quirks at the source.

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects.  It's read as raw nanos (legacy conf) and
    truncated to microseconds — the same precision DuckDB surfaces, so
    oracle comparisons agree.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load every table that exists under sf_dir, keyed by name."""
    out: dict[str, DataFrame] = {}
    for name in names:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
