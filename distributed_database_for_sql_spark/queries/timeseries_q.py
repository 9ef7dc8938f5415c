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


@register(
    "ts_sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("timeseries", "session", "window"),
)
def ts_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute-gap sessions via lag + running sum
    — the batch twin of the streaming session_window query.

    Two window passes over ONE shuffle (same partition key and ordering,
    Spark reuses the sort), then a per-session aggregate.  Gap and
    duration math is integer microseconds, exact on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = events.withColumn(
        "new_s",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    return (
        marked.withColumn("session_id", F.sum("new_s").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .alias("dur_us"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "ts_funnel_signup_click_purchase",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS ts FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e JOIN s
            ON e.user_id = s.user_id AND e.ts > s.ts
               AND epoch_us(e.ts) - epoch_us(s.ts) <= 86400000000
          WHERE e.event_type = 'click' GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e JOIN c
            ON e.user_id = c.user_id AND e.ts > c.ts
               AND epoch_us(e.ts) - epoch_us(c.ts) <= 86400000000
          WHERE e.event_type = 'purchase' GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_1d,
           (SELECT COUNT(*) FROM p) AS n_purchase_1d
    """,
    tags=("timeseries", "funnel", "join"),
)
def ts_funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: first signup → first click within 1 day → first
    purchase within 1 day of that click.

    Each stage's per-user first-event frame is at most |users| rows, so
    stages broadcast into the next event scan; the fact table is scanned
    once per stage with the event-type filter pushed down, and nothing
    ever shuffles on more than user_id."""
    events = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000

    def first_after(prev: DataFrame, etype: str) -> DataFrame:
        e = events.filter(F.col("event_type") == etype).select(
            "user_id", F.col("ts").alias("ets"))
        return (
            e.join(F.broadcast(prev), "user_id")
            .filter((F.col("ets") > F.col("ts"))
                    & (F.unix_micros("ets") - F.unix_micros("ts") <= day_us))
            .groupBy("user_id")
            .agg(F.min("ets").alias("ts"))
        )

    s = (events.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("ts")))
    c = first_after(s, "click")
    p = first_after(c, "purchase")
    # One declarative plan: three branch aggregates cross-joined into a
    # single row — no driver-side count() actions.
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_1d")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_1d")))
    )


@register(
    "ts_anomaly_zscore",
    # Means/stds are shared-subexpression window aggregates; z is
    # quantized to 1e-3 and the flag threshold sits at the quantized
    # value, so the cross-engine double jitter (~1e-14 relative, from
    # different summation orders) is far below every decision boundary.
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             stddev_pop(value) AS sigma,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type
    ), scored AS (
      SELECT e.event_type, s.n_events,
             CAST(FLOOR(ABS((e.value - s.mu) / s.sigma) * 1000 + 0.5)
                  AS BIGINT) AS abs_z_milli
      FROM events e JOIN stats s ON e.event_type = s.event_type
      WHERE s.sigma > 0
    )
    SELECT event_type, n_events,
           COUNT(*) FILTER (WHERE abs_z_milli > 2500) AS n_anomalies,
           MAX(abs_z_milli) AS max_abs_z_milli
    FROM scored
    GROUP BY event_type, n_events
    ORDER BY event_type
    """,
    tags=("timeseries", "anomaly", "aggregate", "quality"),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection per event type: learn per-type
    mean/std (population), score every event, count |z| > 2.5 outliers
    — the monitoring primitive behind data-drift and sensor-fault
    alerts.

    Two shuffles total (per-type stats, then the final per-type count)
    with the tiny stats frame broadcast back onto the fact table; the
    scoring itself is row-local arithmetic.  At 100 TB the stats
    aggregate is the only full pass."""
    events = load_table(spark, sf_dir, "events")
    stats = (events.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_pop("value").alias("sigma"),
                  F.count("*").alias("n_events")))
    scored = (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .select(
            "event_type", "n_events",
            F.floor(F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
                    * 1000 + F.lit(0.5)).cast("bigint")
             .alias("abs_z_milli"),
        )
    )
    return (
        scored.groupBy("event_type", "n_events")
        .agg(F.sum(F.when(F.col("abs_z_milli") > 2500, 1).otherwise(0))
              .alias("n_anomalies"),
             F.max("abs_z_milli").alias("max_abs_z_milli"))
        .orderBy("event_type")
    )


@register(
    "mv_incremental_refresh",
    # The incrementally-refreshed rollup must equal the full recompute —
    # that equivalence IS the oracle (sum/count are self-mergeable
    # partial aggregates, the property continuous aggregates rely on).
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
    tags=("materialized-view", "incremental", "timeseries", "sink"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh (the continuous-aggregate /
    hypertable pattern): a per-(hour, type) rollup is materialized to
    parquet from the first ~90% of events, then a late batch (the other
    ~10%) arrives and the view is refreshed by aggregating ONLY the new
    batch and merging it bucket-wise into the stored rollup — never
    rescanning the base history.  The merged view must equal the
    full-recompute oracle, which holds exactly because count/sum are
    mergeable partial aggregates.

    At 100 TB this is the only affordable shape for always-fresh
    rollups: refresh cost scales with the delta, and the merge is a
    bucket-keyed union+re-aggregate (co-partitioned by the view key)."""
    events = load_table(spark, sf_dir, "events")
    key = [F.date_trunc("hour", "ts").alias("bucket"), F.col("event_type")]

    def rollup(df):
        # Quantize to integer cents PER ROW, then sum: integer partials are
        # exactly mergeable across refreshes (round-of-sums is not — the
        # old per-batch ROUND only agreed with the global oracle because
        # the synthetic values happened to be cents-exact).
        cents_row = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        return df.groupBy(*key).agg(
            F.count("*").alias("n"),
            F.sum(cents_row).alias("cents"))

    hist = events.filter(F.col("event_id") % 10 != 0)
    delta = events.filter(F.col("event_id") % 10 == 0)

    from ..tmpstage import staging_dir

    path = staging_dir("mv_rollup", sf_dir)
    rollup(hist).write.mode("overwrite").parquet(path)

    stored = spark.read.parquet(path)
    merged = (
        stored.unionByName(rollup(delta))
        .groupBy("bucket", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    return merged.orderBy("bucket", "event_type")
