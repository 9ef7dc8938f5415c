"""Query registry.

Every operator family from SURVEY.md §2.C lands here as one or more named
QuerySpecs: a Spark DataFrame builder plus (where SQL-expressible) the
equivalent DuckDB oracle SQL.  The driver contract (__spark_entry__.py)
is generated from this registry.

Naming discipline: every computed/aggregate column is aliased identically
in the Spark builder and the oracle SQL — the driver sorts columns by name
before value-hashing, so names must match exactly.  Double-typed aggregates
are rounded (both sides) to absorb floating-point summation-order jitter
between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def register(name: str, oracle: str | None = None,
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags,
                                    doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing the query modules populates this)."""
    # Import side-effect modules lazily to avoid circular imports.
    #
    # ORDER MATTERS: the per-round driver oracles a prefix of this registry
    # (round 1 checked exactly the first 50 entries).  Families that are not
    # yet driver-certified go first; rows already green in CORRECTNESS_r01.json
    # (TPC-H, relational, joins, the first 5 aggregate entries) move to the
    # back.  Round-1 front 50: llm_dedup(7) + llm_similarity(5) + pipeline(1)
    # + text_analysis(9) + streaming(7) + udfs(4) + sql_api(7) +
    # timeseries(4) + windows(6) = 50.
    from . import (  # noqa: F401
        llm_dedup,
        llm_similarity,
        pipeline_q,
        text_analysis,
        streaming_q,
        udfs,
        sql_api,
        timeseries_q,
        windows,
        functions_sql,
        aggregates,
        sources_q,
        multimodal_q,
        curation_q,
        tpch,
        tpch_extra,
        relational,
        joins,
    )

    return dict(_REGISTRY)
