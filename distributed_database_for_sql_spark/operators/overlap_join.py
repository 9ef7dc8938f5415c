"""Interval-overlap join via time binning: interval x interval as an
equi join, without a distinct pass.

The sibling of operators/interval_join.py (point-in-interval): here BOTH
sides are intervals and the predicate is span overlap
(a.start < b.end AND b.start < a.end, half-open).  A naive theta join is
a BroadcastNestedLoopJoin / CartesianProduct; the scale shape is the
same binning trick — explode each interval into the fixed-width bins its
span touches, equi-join on the bin — plus one extra idea to avoid the
post-join DISTINCT that naive binning needs (an overlapping pair meets
in EVERY shared bin):

    keep a pair only in the FIRST bin both spans cover, which is exactly
    the bin containing max(a.start, b.start).

Every truly overlapping pair shares that bin (it lies inside both
spans), and it is unique per pair, so the output has no duplicates and
no misses — lossless, and the dedup is a free row-local filter instead
of a shuffle.

Replication factor per interval is ceil(span/bin)+1, the usual blocking
trade-off; at 100 TB both sides can be written bucketed by bin, turning
this into a co-located join (operators/bucketing.py composes).

The reference has no joins at all (SURVEY.md §2.A/§2.D — a Go Raft
core, src/raft/node.go); this extends the target surface of §2.C.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner-join interval rows whose half-open spans overlap:
    left.[ls, le) x right.[rs, re) with ls < re AND rs < le.

    Both sides are exploded into bin_seconds-wide bins; the exact overlap
    predicate and the first-shared-bin condition run as post-join filters,
    so the only shuffle is one equi hash join on the bin key and the
    result needs no deduplication."""

    def to_bin(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bin_seconds).cast("long")

    lb = left.withColumn(
        "__bin",
        F.explode(F.sequence(to_bin(F.col(left_start)),
                             to_bin(F.col(left_end)))),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(F.sequence(to_bin(F.col(right_start)),
                             to_bin(F.col(right_end)))),
    )
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end))
    first_shared = F.col("__bin") == F.floor(
        F.unix_timestamp(F.greatest(F.col(left_start), F.col(right_start)))
        / bin_seconds
    ).cast("long")
    return lb.join(rb, "__bin").filter(overlap & first_shared).drop("__bin")
