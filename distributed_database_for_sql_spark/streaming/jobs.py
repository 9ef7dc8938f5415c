"""Structured Streaming jobs over the events table.

The reference's one behavioral contract is an ordered, exactly-once apply
stream (`applyCh`, /root/reference/src/raft/node.go:35 — see SURVEY.md
§1.3); Structured Streaming's checkpointed micro-batches are the Spark
substrate for it.  These jobs read the events parquet through a *file
streaming source* (schema-pinned, nanos→micros normalized like the batch
catalog), run a windowed/stateful computation, and drain synchronously
(`processAllAvailable`) into a memory sink so the driver's batch-shaped
contract can verify the result.

Determinism note: every job here has a batch-equivalent answer once all
input is consumed — that's what makes the DuckDB oracle applicable.
Late-data semantics (watermark drops across micro-batches) are inherently
multi-batch and are pinned by tests/test_streaming.py instead.

At scale: the file source becomes Kafka/cloud storage; the memory sink
becomes foreachBatch → ACID table; watermarks bound state size; nothing
else changes.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) as raw longs
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file-source stream, ts normalized to microseconds.

    FileStreamSource requires a directory; the single parquet file is
    staged via symlink into a temp dir (read-only testdata untouched).
    """
    from ..tmpstage import staging_dir

    src = os.path.join(sf_dir, "events.parquet")
    stage = staging_dir("events_stream", src)
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    # Some testdata generations write ts as TIMESTAMP(NANOS) (streamed as
    # raw longs via the legacy conf, then truncated to micros), others as
    # TIMESTAMP(MICROS) (streamed natively).  Probe the footer to pick the
    # schema, mirroring catalog.load_table.
    import pyarrow.parquet as pq

    nanos = str(pq.read_schema(src).field("ts").type) == "timestamp[ns]"
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(stage)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = T.StructType(
        [f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
         for f in EVENTS_RAW_SCHEMA.fields]
    )
    raw = spark.readStream.schema(schema).parquet(stage)
    # Session-TZ TIMESTAMP (UTC here), required by watermarks/event-time.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_completion(result: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drain a streaming DataFrame into a memory sink; return batch result."""
    spark = result.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type: count + sum(value)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type", "n", "total",
    )


def sliding_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: avg(value) per window.

    The average is reported in integer micro-units ((cents·10000) div n):
    `value` is 2-decimal data, so the windowed sum is exact in cents and
    integer division is bit-deterministic across engines — a float avg
    can land exactly on a rounding boundary and flip the last digit.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
        F.expr(
            "(CAST(ROUND(total * 100) AS BIGINT) * 10000) div n"
        ).alias("avg_value_e6"),
    )


def session_windows(spark: SparkSession, sf_dir: str, gap: str = "10 minutes",
                    max_users: int = 30) -> DataFrame:
    """Per-user session windows (gap-close semantics)."""
    ev = events_stream(spark, sf_dir).filter(F.col("user_id") < max_users)
    agg = (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events", "session_value",
    )


def stateful_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on event_id under a watermark, then a
    batch count per event_type over the deduped append output."""
    ev = events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    out = run_to_completion(deduped, "append")
    return out.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_unique"),
    )


def stream_static_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static dimension (event_type → weight), weighted totals.

    The static side is a tiny in-memory dim — broadcast to every
    micro-batch; the canonical enrichment-join shape."""
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    ev = events_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(dim), "event_type")
    agg = joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted_total"),
    )
    return run_to_completion(agg, "complete")


def user_running_state(spark: SparkSession, sf_dir: str,
                       max_users: int = 50) -> DataFrame:
    """Arbitrary stateful processing via applyInPandasWithState.

    Per-user running aggregate (event count, value total, last event
    time) held in explicit group state — the template for custom stateful
    operators Spark's built-in windows can't express (counters, sessions
    with custom close rules, online models).  Each micro-batch emits the
    user's state-so-far plus a monotone `rows_seen`; the caller keeps the
    row with max rows_seen per user, so the result is the same whether
    the source delivers one batch or many.

    At scale state lives in the state store (RocksDB-backed, checkpointed,
    partitioned by key) — the contract the reference's applyCh consumer
    would have needed (/root/reference/src/raft/node.go:35).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("rows_seen", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ])

    def update(key, pdfs, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = int(pd.to_datetime(pdf["ts"]).astype("int64").max()) // 1000
            last_us = max(last_us, mx)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "rows_seen": [n], "n_events": [n],
             "total_value": [total], "last_us": [last_us]}
        )

    ev = events_stream(spark, sf_dir).filter(F.col("user_id") < max_users)
    updated = ev.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    drained = run_to_completion(updated, "update")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("rows_seen"))
    return (
        drained.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events",
                F.round("total_value", 2).alias("total_value"),
                F.timestamp_micros(F.col("last_us")).alias("last_ts"))
    )


def stream_stream_join(spark: SparkSession, sf_dir: str,
                       horizon: str = "1 hour") -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    prior clicks within `horizon` (event time).

    Both sides are watermarked and the join condition bounds click time to
    [purchase − horizon, purchase], so Spark can expire buffered state —
    the canonical funnel/attribution join.  Matching uses micro-batch
    state exactly like production; draining the file source makes the
    final append output equal the batch join, which is what the oracle
    recomputes.
    """
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
                F.col("value").alias("purchase_value"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
    )
    out = run_to_completion(joined, "append")
    return out.select("purchase_id", "click_id", F.col("p_user").alias("user_id"),
                      "p_ts", "c_ts", F.round("purchase_value", 2).alias("purchase_value"))


def stream_interval_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed events ⋈ static per-hour maintenance windows via the SAME
    binned interval join the batch query uses (operators/interval_join.py)
    — binning is stateless row-local math, so the operator composes with
    Structured Streaming unchanged (stream left, static right, inner).
    Complete-mode aggregate per window; equals the batch result once the
    stream drains."""
    from ..catalog import load_table
    from ..operators.interval_join import interval_point_join

    ev = events_stream(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")
    intervals = (
        batch.select(F.date_trunc("hour", "ts").alias("h")).distinct()
        .select(F.expr("h + INTERVAL 30 MINUTES").alias("w_start"),
                F.expr("h + INTERVAL 90 MINUTES").alias("w_end"))
    )
    joined = interval_point_join(
        intervals, ev, "w_start", "w_end", "ts", bin_seconds=3600)
    agg = joined.groupBy("w_start").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"))
    return run_to_completion(agg, "complete")


def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming z-score anomaly flagging against offline-learned stats.

    The per-type mean/std are learned from the batch table (the offline
    model-fit step of any production detector), broadcast as a static
    dim into the stream, and every event is scored row-locally; the
    complete-mode aggregate counts |z| > 2.5 outliers per type.  Scoring
    adds no state — state lives only in the final counting aggregate."""
    from ..catalog import load_table

    batch = load_table(spark, sf_dir, "events")
    stats = (batch.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_pop("value").alias("sigma"),
                  F.count("*").alias("n_events")))
    ev = events_stream(spark, sf_dir)
    scored = (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .withColumn(
            "abs_z_milli",
            F.floor(F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
                    * 1000 + F.lit(0.5)).cast("bigint"))
    )
    agg = scored.groupBy("event_type", "n_events").agg(
        F.sum(F.when(F.col("abs_z_milli") > 2500, 1).otherwise(0))
         .alias("n_anomalies"),
        F.max("abs_z_milli").alias("max_abs_z_milli"),
    )
    return run_to_completion(agg, "complete")


def dedup_within_watermark_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicatesWithinWatermark: dedup state is evicted
    once an id's event time falls behind the watermark — the bounded-
    state form of streaming dedup (plain dropDuplicates keys state
    forever within a run).  event_ids are unique in the fixture, so the
    drained output equals the input — proving the eviction never drops
    a live row."""
    ev = events_stream(spark, sf_dir)
    deduped = (ev.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["event_id"]))
    out = run_to_completion(deduped, "append")
    return out.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_unique"),
    )
