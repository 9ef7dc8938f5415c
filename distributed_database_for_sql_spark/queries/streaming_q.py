"""Streaming queries exposed through the driver contract.

Each entry runs a real Structured Streaming job (file source → windowed /
stateful computation → memory sink, drained synchronously) and returns the
final batch-equivalent result, which the DuckDB oracle recomputes with
batch SQL (SURVEY.md §5.2.4).  Multi-batch-only semantics (late-data
drops) live in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import jobs
from .base import register


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           CAST(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type (real stream run)."""
    return jobs.tumbling_counts(spark, sf_dir).orderBy("window_start", "event_type")


@register(
    "stream_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT unnest([
               time_bucket(INTERVAL '30 minutes', ts),
               time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
             ]) AS wstart,
             ts, value
      FROM events
    )
    SELECT CAST(wstart AS TIMESTAMP) AS window_start,
           CAST(wstart + INTERVAL '1 hour' AS TIMESTAMP) AS window_end,
           COUNT(*) AS n,
           (CAST(ROUND(SUM(value) * 100) AS BIGINT) * 10000) // COUNT(*) AS avg_value_e6
    FROM buckets
    WHERE ts >= wstart AND ts < wstart + INTERVAL '1 hour'
    GROUP BY wstart
    ORDER BY window_start
    """,
    tags=("streaming", "window"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in two
    windows; the oracle materializes the same membership via unnest."""
    return jobs.sliding_averages(spark, sf_dir).orderBy("window_start")


@register(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '10 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 30
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP)                        AS session_start,
           CAST(MAX(ts) + INTERVAL '10 minutes' AS TIMESTAMP) AS session_end,
           COUNT(*)                                          AS n_events,
           ROUND(SUM(value), 2)                              AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (10-minute inactivity gap).

    Spark's session_window end = last event + gap; the oracle reproduces
    that with the classic gaps-and-islands formulation."""
    return jobs.session_windows(spark, sf_dir).orderBy("user_id", "session_start")


@register(
    "stream_stateful_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_unique
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup"),
)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on event_id (watermarked), counted per type.

    event_ids are unique in the fixture, so deduped == input — the check
    proves no row is dropped or duplicated across micro-batches."""
    return jobs.stateful_dedup_counts(spark, sf_dir).orderBy("event_type")


@register(
    "stream_static_join",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           ROUND(SUM(value * CASE event_type
                 WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
                 WHEN 'purchase' THEN 10.0 WHEN 'signup' THEN 5.0
                 ELSE 0.0 END), 2) AS weighted_total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ broadcast static dimension, weighted aggregation."""
    return jobs.stream_static_join_agg(spark, sf_dir).orderBy("event_type")


@register(
    "stream_stateful_user_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(ts) AS last_ts
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "state", "applyInPandasWithState"),
)
def stream_stateful_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    count/total/last-seen kept in explicit group state.  Once the stream
    drains, the final state per user equals the batch aggregate — which is
    exactly what the oracle recomputes."""
    return jobs.user_running_state(spark, sf_dir).orderBy("user_id")


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id, p.ts AS p_ts, c.ts AS c_ts,
           ROUND(p.value, 2) AS purchase_value
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
    ORDER BY purchase_id, click_id
    """,
    tags=("streaming", "join", "stream-stream"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (purchase ⋈ prior clicks ≤ 1 h back,
    per user) run as a real Structured Streaming job; the drained append
    output equals the batch interval join the oracle computes."""
    return jobs.stream_stream_join(spark, sf_dir).orderBy("purchase_id", "click_id")


@register(
    "stream_anomaly_zscore",
    # Same quantization rationale as ts_anomaly_zscore: z is floored to
    # 1e-3 so cross-engine double jitter sits far below every boundary.
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
    tags=("streaming", "anomaly", "join", "quality"),
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_anomaly_zscore: offline-learned per-type
    stats broadcast into the events stream, row-local scoring, complete-
    mode outlier counting — the online serving half of the batch
    detector, sharing its oracle."""
    return jobs.stream_anomaly_zscore(spark, sf_dir).orderBy("event_type")


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_unique
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup", "watermark"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — the bounded-state streaming dedup
    (state for an id is dropped once the watermark passes it, unlike
    plain dropDuplicates whose state grows for the whole run).  Unique
    fixture ids ⇒ output == input, same oracle as the unbounded form."""
    return jobs.dedup_within_watermark_counts(spark, sf_dir).orderBy("event_type")
