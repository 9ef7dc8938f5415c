"""Bucketed (pre-partitioned) tables: shuffle-free co-located joins.

A join between two large fact tables shuffles BOTH sides on the key —
at 100 TB that shuffle dominates the query.  If both tables are written
bucketed by the join key into the same number of buckets, Spark's scan
reports a hash-partitioning that already satisfies the join's
distribution requirement, and the sort-merge join runs with ZERO
exchanges: each task reads bucket i of both sides.

This is the storage-layout half of shuffle elimination (the runtime half
is broadcast).  The cost is paid once at write time; every subsequent
join/aggregation keyed on the bucket column is shuffle-free — the right
trade for fact tables joined repeatedly on the same key (orderkey here;
at 100 TB also the layout for the documents/embeddings id spine).

Requires the session catalog (`saveAsTable`) — bucket metadata lives in
the table definition, not in the parquet files themselves.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _external_location(table: str) -> str:
    """Explicit tmp location: a driver-supplied session's default
    warehouse is $CWD/spark-warehouse, which must not be written to."""
    return os.path.join(tempfile.gettempdir(), "spark_graft_bucketed",
                        table.lower())


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 8,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sort-within-bucket)
    EXTERNAL table under the system tmpdir.

    The session catalog is in-memory, so a table directory left by a
    previous process is invisible to `mode("overwrite")` and makes
    saveAsTable fail with LOCATION_ALREADY_EXISTS — orphaned locations
    are removed first.
    """
    spark = df.sparkSession
    loc = _external_location(table)
    if not spark.catalog.tableExists(table) and os.path.exists(loc):
        shutil.rmtree(loc)
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (df.write.mode("overwrite").format("parquet")
         .option("path", loc).bucketBy(num_buckets, *cols))
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*scols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: str | list[str], how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs the
    physical plan contains no shuffle Exchange on either side."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
