"""Window functions: ranking, analytic, frames, top-k per group
(SURVEY.md §2.C "Window functions").

Window evaluation shuffles once on the partition key then sorts within
partitions — at scale the knob that matters is partition-key cardinality
vs. skew; all partition keys here (nation, customer, supplier) are
high-cardinality relative to data volume or bounded and broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register


@register(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    ORDER BY c_nationkey, rn
    """,
    tags=("window", "rank"),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile over one window spec."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_custkey", "c_nationkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_nationkey", "rn")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderkey)  OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation + inter-event gap (days between orders)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_orderdate",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("days_since_prev"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "window_running_frames",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           ROUND(AVG(l_extendedprice) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg_price
    FROM lineitem
    WHERE l_suppkey <= 20
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    tags=("window", "frame"),
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row frames: running sum + 4-row moving average per supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    order = [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w_run = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    w_mov = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-3, 0)
    return (
        li.select(
            "l_suppkey", "l_orderkey", "l_linenumber",
            F.round(F.sum("l_quantity").over(w_run), 2).alias("running_qty"),
            F.round(F.avg("l_extendedprice").over(w_mov), 4).alias("moving_avg_price"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_orderkey
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): orders within $10k below current price.

    Note: COUNT window counts peers across the whole partition's range
    frame, so the filter must apply AFTER the window in both engines —
    here both sides filter first, consistently.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-10000, 0)
    )
    return (
        orders.select(
            "o_orderkey", "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.count("*").over(w).alias("n_similar"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value (full frame) / percent_rank / cume_dist."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(total_spend, 2) AS spend
    FROM (
      SELECT c_mktsegment, c_custkey, SUM(o_totalprice) AS total_spend,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY SUM(o_totalprice) DESC, c_custkey ASC) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment, c_custkey
    ) t
    WHERE rn <= 3
    ORDER BY c_mktsegment, spend DESC, c_custkey
    """,
    tags=("window", "topk", "join"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 spenders per market segment: agg → row_number ≤ k.

    The agg shrinks data before the window, so the window sort touches
    |customers| rows, not |orders| — the right order of operations at scale.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("o_totalprice").alias("total_spend"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("total_spend", 2).alias("spend"))
        .orderBy("c_mktsegment", F.desc("spend"), "c_custkey")
    )


@register(
    "window_rolling_time_range",
    # Both engines order by integer epoch-micros and sum 2-decimal values
    # whose cents-rounded total is exact — no float boundary anywhere.
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(ROUND(SUM(value) OVER w * 100) AS BIGINT) AS sum_1h_cents
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("window", "timeseries", "range-frame"),
)
def window_rolling_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling aggregate per user at every event — the
    time-interval RANGE frame (continuous-aggregate / hypertable
    primitive) as opposed to the numeric range frame above.

    Ordering on integer epoch-microseconds makes the frame boundary
    engine-exact; one shuffle on the partition key, frame evaluation is
    a per-partition sliding scan at any scale."""
    events = load_table(spark, sf_dir, "events")
    ev = (events.filter(F.col("user_id") < 20)
          .withColumn("ts_us", F.unix_micros("ts")))
    w = (W.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-3_600_000_000, 0))
    return (
        ev.select(
            "event_id", "user_id",
            F.count("*").over(w).alias("n_1h"),
            F.round(F.sum("value").over(w) * 100).cast("bigint")
             .alias("sum_1h_cents"),
        )
        .orderBy("event_id")
    )
