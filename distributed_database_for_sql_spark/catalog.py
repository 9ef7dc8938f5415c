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


# Lazy-PLAN cache (never results): `spark.read.parquet` pays a py4j
# round-trip + file listing + footer schema inference per call, and the
# bench re-resolves the same static tables hundreds of times (every
# Engine() init registers all of them).  A DataFrame is an immutable
# logical plan — reusing the object skips only the plan construction;
# every action still scans the parquet.  Keyed by session + the table's
# content fingerprint (path, mtime, size), so regenerated testdata is
# re-resolved, never served stale.
_PLAN_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes physical-type quirks at the source.

    `events.ts` has been written as parquet TIMESTAMP(NANOS) by some
    testdata generations — Spark's vectorized reader rejects that, so it
    is read as raw nanos (legacy conf) and truncated to microseconds,
    the precision DuckDB surfaces.  Generations that write TIMESTAMP
    (MICROS) need no conversion; the branch is decided by the type Spark
    actually reads, so both layouts load identically.
    """
    if name == "events":
        # session conf, not plan state: must be set per session even when
        # the plan object is served from cache (sessions share one app)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # a DataFrame is bound to its creating session: key by the session
    # object (id) as well as the app, so another session never receives
    # a plan it cannot execute under its own confs
    key = (spark.sparkContext.applicationId, id(spark),
           table_fingerprint(sf_dir, name))
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    if len(_PLAN_CACHE) > 256:  # a handful of sf_dirs × tables in practice
        _PLAN_CACHE.clear()
    _PLAN_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str,
                         name: str) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # TIMESTAMP(MICROS) parquet surfaces as TIMESTAMP_NTZ; cast to
            # session-TZ TIMESTAMP (sessions here run UTC) so event-time
            # (watermarks) and unix_micros keep working — same wall time.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
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


def table_fingerprint(sf_dir: str, name: str) -> str:
    """Identity string for a table's CURRENT on-disk contents — path plus
    mtime and size of the parquet.  Use this (not the bare path) as a
    memoization key for anything trained on the data (e.g. the k-means /
    PQ caches in operators/ivf.py): the driver regenerates the testdata
    parquet between rounds, and a path-only key would serve parameters
    trained on the previous generation."""
    p = table_path(sf_dir, name)
    try:
        st = os.stat(p)
        return f"{p}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return p
