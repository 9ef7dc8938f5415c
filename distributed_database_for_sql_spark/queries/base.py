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


# ---------------------------------------------------------------------------
# Certification schedule
#
# The external driver verifies a 50-entry prefix of this registry per round
# against DuckDB oracles (CORRECTNESS_r{N}.json).  Because the window is
# smaller than the registry, coverage is completed by ROTATION: each round
# fronts the queries that have never been driver-certified, until every query
# has a green row in some CORRECTNESS_r*.json.  Regression-hunting note —
# which file certifies which family:
#
#   r1 (CORRECTNESS_r01.json): TPC-H q1–q22, relational (projection/filter/
#       null/sort/distinct), set ops, joins (incl. as-of / salted / bucketed),
#       aggregates head (having / count-distinct / approx-cd / rollup / cube).
#       One red row: q12_shipping_delay_priority (oracle HUGEINT-vs-BIGINT
#       hash artifact; fixed in r2, re-certified in the r3 window).
#   r2 (CORRECTNESS_r02.json): LLM dedup + similarity/ANN, pipeline, text
#       analysis, streaming, UDF/UDTF, SQL/subqueries/CTE/command-log,
#       time-series, window functions.
#   r3 (CORRECTNESS_r03.json): function suites, aggregates tail (global/
#       percentiles/pivot/unpivot/grouping-sets/argmax), sources/sinks,
#       multimodal, curation (decontam/packing/PII/repetition/split/TF-IDF/
#       compression), interval joins, incremental cross-corpus dedup, the
#       q12 re-certification, every rows-only query — plus 10 regression
#       canaries re-drawn from the r1/r2 families (positions 41–50).
#
# POLICY for new queries: append the name to _FRONT_WINDOW below (displacing
# a canary if the window is full) so the driver certifies it in the round it
# ships.  Never park an unverified query outside the window.
# ---------------------------------------------------------------------------

_FRONT_WINDOW: tuple[str, ...] = (
    # -- never driver-certified: oracled (33, incl. the q12 re-cert) --------
    "q12_shipping_delay_priority",
    "fn_string_suite",
    "fn_datetime_suite",
    "fn_math_suite",
    "fn_array_suite",
    "fn_map_suite",
    "fn_json_suite",
    "fn_conditional_suite",
    "fn_array_hof_suite",
    "agg_global_stats",
    "agg_percentiles",
    "agg_pivot",
    "agg_unpivot",
    "agg_grouping_sets",
    "agg_approx_percentile",
    "agg_argmax_struct",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "sink_partitioned_pruned_scan",
    "source_orc_roundtrip",
    "source_text_roundtrip",
    "multimodal_payload_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "decontam_benchmark_overlap",
    "pack_sequences_chunked",
    "text_pii_redact",
    "text_repetition_score",
    "split_train_val_test",
    "text_tfidf_top_terms",
    "join_interval_maintenance",
    "stream_interval_static_join",
    "dedup_incremental_cross",
    "multimodal_image_meta_udf",   # oracled in r3 (hex-byte arithmetic)
    "multimodal_feature_extract",  # oracled in r3 (hex-byte arithmetic)
    # -- new in r3 (policy: new queries certify the round they ship) --------
    "source_quota_sampling",
    "token_length_histogram",
    "quality_quantile_filter",
    "dedup_rate_by_source",
    # -- never driver-run: rows-only by design (5) --------------------------
    "sample_seeded",
    "sample_stratified",
    "sink_range_sharded",
    "ann_pq_adc_topk",
    "text_compression_ratio",
    # -- regression canaries from previously-certified families (6; four of
    #    the original ten were displaced by the new-in-r3 queries, per the
    #    policy above, to keep the window at exactly 50 entries) ------------
    "q1_pricing_summary",          # r1 TPC-H
    "agg_having",                  # r1 aggregates head
    "join_bucketed_colocated",     # r1 zero-Exchange bucketed join
    "dedup_exact_survivors",       # r2 LLM dedup
    "stream_tumbling_window",      # r2 streaming
    "window_topk_per_group",       # r2 window functions
)


def registry() -> dict[str, QuerySpec]:
    """All registered queries, ordered by the certification schedule above."""
    # Import side-effect modules lazily to avoid circular imports.
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

    missing = [n for n in _FRONT_WINDOW if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_FRONT_WINDOW names not in registry: {missing}")
    ordered = {n: _REGISTRY[n] for n in _FRONT_WINDOW}
    for n, spec in _REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    return ordered
