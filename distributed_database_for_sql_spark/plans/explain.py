"""Plan-inspection helpers: assert the physical plan is the one you want.

Used by tests (and by hand during tuning) to guard the scale-critical
properties SURVEY.md §4.2 relies on Catalyst for: filters pushed into the
parquet scan, projections pruned, small sides broadcast, no Cartesian
products sneaking in.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan received at least one pushed filter."""
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def count_exchanges(df: DataFrame, include_fanout: bool = True) -> int:
    """Number of shuffle exchanges in the plan (lower = better, usually).

    Counts only the detail-section headers "(n) Exchange" — each node
    also appears in the plan tree, so matching every line containing
    "Exchange" double-counts.

    ``include_fanout=False`` excludes deliberate REPARTITION_BY_NUM
    round-robin fan-outs (used to parallelize work downstream of a
    single-file scan); those are a scan-shape workaround, not a
    join/aggregation shuffle, and carry the pre-explode (small) rows.
    """
    import re

    plan = physical_plan(df)
    lines = plan.splitlines()
    count = 0
    for i, line in enumerate(lines):
        if not re.match(r"^\(\d+\) Exchange\b", line.strip()):
            continue
        if not include_fanout:
            detail = "\n".join(lines[i:i + 4])
            if "REPARTITION_BY_NUM" in detail and "RoundRobin" in detail:
                continue
        count += 1
    return count
