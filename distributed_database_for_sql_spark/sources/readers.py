"""Batch readers beyond parquet: CSV / JSON / in-memory rows
(SURVEY.md §2.C "Scans / sources / sinks").

Schemas are always explicit — `inferSchema` triggers an extra full pass
and type drift; at 100 TB both are unacceptable.  Lakehouse formats
(Delta/Iceberg/Hudi) need jars absent from this image; their factories
raise a clear error instead of failing mid-plan (import-try gating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, **options) -> DataFrame:
    return spark.read.schema(schema).options(header=str(header).lower(),
                                             **options).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType,
              **options) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def from_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """In-memory rows → DataFrame (test fixtures, tiny dimensions)."""
    return spark.createDataFrame(rows, schema=schema)


def read_delta(spark: SparkSession, path: str,
               version: int | None = None) -> DataFrame:
    """ACID table-format read: snapshot (or time-travel) of a native
    transaction-log table (sources/txlog.py — the Delta-style log protocol
    on parquet + JSON commits; the delta-spark jars are absent from this
    image, so the format is implemented natively rather than stubbed)."""
    from .txlog import TxLogTable

    return TxLogTable(spark, path).read(version=version)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: tuple[str, ...] = ()) -> None:
    """Batch sink: partitioned parquet (partition columns drive pruning)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
