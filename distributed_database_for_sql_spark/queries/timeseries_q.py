"""Hypertable-style time-series rollups over the events table: bucketed
aggregation, gap-filled spines, and LOCF interpolation (SURVEY.md §2.C
"custom operators" — the batch twin of the streaming window queries).

The dense bucket spine is generated with `sequence()` (JVM-side, no
driver loop) and joined back to the sparse per-bucket aggregate — the
standard time_bucket_gapfill shape.  The spine is |groups| × |buckets|
rows, tiny relative to the fact table at any scale, so it broadcasts;
the only fact-table shuffle is the one bucketed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register

_SPINE_SQL = """
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(
          (SELECT date_trunc('hour', MIN(ts)) FROM events),
          (SELECT date_trunc('hour', MAX(ts)) FROM events),
          INTERVAL 1 HOUR)) AS bucket) g
"""


def _spine(events: DataFrame) -> DataFrame:
    """Dense (event_type × hourly bucket) spine spanning the data range."""
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket")
    )
    types = events.select("event_type").distinct()
    return types.crossJoin(F.broadcast(hours))


@register(
    "ts_rollup_gapfill",
    oracle=f"""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n, SUM(value) AS sv
      FROM events GROUP BY 1, 2
    ), spine AS ({_SPINE_SQL})
    SELECT s.event_type, s.bucket,
           COALESCE(b.n, 0) AS n, ROUND(COALESCE(b.sv, 0), 2) AS sv
    FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.bucket = b.bucket
    ORDER BY s.event_type, s.bucket
    """,
    tags=("timeseries", "rollup", "gapfill"),
)
def ts_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup with zero-filled gaps (time_bucket_gapfill).

    One shuffle aggregates the fact table per (type, hour); the dense
    spine left-joins the sparse buckets so silent hours surface as
    explicit zero rows — what a monitoring/training-data pipeline needs
    to distinguish 'no events' from 'no data'."""
    events = load_table(spark, sf_dir, "events")
    buckets = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )
    return (
        _spine(events)
        .join(buckets, ["event_type", "bucket"], "left")
        .select(
            "event_type", "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.round(F.coalesce("sv", F.lit(0.0)), 2).alias("sv"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "ts_locf_interpolation",
    oracle=f"""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, AVG(value) AS av
      FROM events GROUP BY 1, 2
    ), spine AS ({_SPINE_SQL})
    SELECT s.event_type, s.bucket,
           ROUND(last_value(b.av IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled_av
    FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.bucket = b.bucket
    ORDER BY s.event_type, s.bucket
    """,
    tags=("timeseries", "gapfill", "interpolation", "window"),
)
def ts_locf_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly average with last-observation-carried-forward.

    F.last(ignorenulls) over an unbounded-preceding frame — the window
    partitions on event_type, so the sort is per-group, never global."""
    events = load_table(spark, sf_dir, "events")
    buckets = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.avg("value").alias("av"))
    )
    w = (
        W.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _spine(events)
        .join(buckets, ["event_type", "bucket"], "left")
        .select(
            "event_type", "bucket",
            F.round(F.last("av", ignorenulls=True).over(w), 4).alias("filled_av"),
        )
        .orderBy("event_type", "bucket")
    )
