"""Point-in-interval join via time binning: range join as an equi join.

A naive `points JOIN intervals ON ts BETWEEN start AND end` is a non-equi
join — Spark plans it as BroadcastNestedLoopJoin (fine only when one side
is tiny) or a CartesianProduct.  The standard scale fix is BINNING: pick
a bin width ≥ 0, explode every interval into the bins it covers, compute
each point's single bin, equi-join on the bin, and keep the exact
containment predicate as a post-join filter.

Properties:
- LOSSLESS: an interval covers every bin its span touches, and a point's
  bin is one of them, so every true (point, interval) pair meets in
  exactly one bin — no duplicates (a point has ONE bin), no misses.
- Shuffle is an equi hash join on the bin key; interval replication
  factor is ceil(span/bin) + 1, so the bin width dial trades replication
  against bucket size exactly like any blocking key.
- At 100 TB both sides can be pre-partitioned/bucketed by bin, making
  this a co-located join (operators/bucketing.py composes).

The reference has no joins (SURVEY.md §2.D); this is the engine-side
100 TB pattern for the `events` hypertable surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose
    [start_col, end_col) half-open span contains its ts_col.

    Returns the joined frame (all columns of both inputs).  `how` may be
    'inner' or 'left_interval' (keep intervals with no points; implemented
    as a right outer on the points side after binning)."""
    if how not in ("inner", "left_interval"):
        raise ValueError(f"unsupported how: {how!r}")

    def to_bin(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bin_seconds).cast("long")

    binned_ivl = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(to_bin(F.col(start_col)),
                             to_bin(F.col(end_col)))),
    )
    binned_pts = points.withColumn("__bin", to_bin(F.col(ts_col)))
    contained = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col))
    if how == "inner":
        return (binned_pts.join(binned_ivl, "__bin")
                .filter(contained).drop("__bin"))
    # left_interval: keep empty intervals — join points into intervals,
    # null out the point columns that fail containment, then keep one
    # row per interval when no point matched.
    joined = binned_ivl.join(binned_pts, "__bin", "left")
    kept = joined.filter(contained).drop("__bin")
    empty = (binned_ivl.join(
        kept.select(start_col, end_col).distinct(),
        [start_col, end_col], "left_anti")
        .drop("__bin").dropDuplicates([start_col, end_col]))
    for c in points.columns:
        empty = empty.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
    return kept.unionByName(empty.select(kept.columns))
