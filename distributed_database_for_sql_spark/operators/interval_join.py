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

    contained = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col))
    if how == "inner":
        binned_ivl = intervals.withColumn(
            "__bin",
            F.explode(F.sequence(to_bin(F.col(start_col)),
                                 to_bin(F.col(end_col)))),
        )
        binned_pts = points.withColumn("__bin", to_bin(F.col(ts_col)))
        return (binned_pts.join(binned_ivl, "__bin")
                .filter(contained).drop("__bin"))
    # left_interval: keep empty intervals.  Interval identity must be the
    # ROW, not the (start, end) span — two intervals sharing a span (e.g.
    # two resources under the same maintenance window) are distinct rows,
    # so each gets a per-row surrogate id BEFORE binning.  The id frame is
    # referenced exactly once in the plan, so the nondeterminism of
    # monotonically_increasing_id across recomputations cannot bite.
    from pyspark.sql import Window

    binned_ivl = (intervals
                  .withColumn("__ivl_id", F.monotonically_increasing_id())
                  .withColumn("__bin",
                              F.explode(F.sequence(to_bin(F.col(start_col)),
                                                   to_bin(F.col(end_col))))))
    binned_pts = (points
                  .withColumn("__bin_p", to_bin(F.col(ts_col)))
                  .withColumn("__pt", F.lit(True)))
    # Containment inside the join condition => true left-outer semantics:
    # every exploded interval copy survives, matched copies carry point
    # columns, unmatched copies carry nulls.
    joined = binned_ivl.join(
        binned_pts, (F.col("__bin") == F.col("__bin_p")) & contained, "left")
    # Collapse the exploded copies: keep all matched rows (each true pair
    # meets in exactly one bin, so no duplicates), plus ONE null-extended
    # row per interval id that matched nowhere.
    w = Window.partitionBy("__ivl_id")
    out = (joined
           .withColumn("__any", F.max("__pt").over(w))
           .withColumn("__rn",
                       F.row_number().over(w.orderBy(F.col("__bin"))))
           .filter(F.col("__pt").isNotNull()
                   | (F.col("__any").isNull() & (F.col("__rn") == 1)))
           .drop("__ivl_id", "__bin", "__bin_p", "__pt", "__any", "__rn"))
    return out
