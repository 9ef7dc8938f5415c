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
#       Two red rows, both repaired for the r4 window: fn_math_suite
#       (cross-engine ROUND(double) divergence → outputs now floor-
#       quantized BIGINTs) and multimodal_feature_extract (list-typed
#       byte_hist crashed the driver canonicalizer → flattened to four
#       scalar columns, float stats quantized).
#   r4: the two r3 repairs (fn_math_suite, multimodal_feature_extract),
#       the new-in-r4 queries (quality rules, domain mixture, interval
#       overlap, PageRank, skew/stats profilers, anomaly batch+stream,
#       fuzzy join, SCD classify, rolling time-range window, IVF-PQ,
#       CMS heavy hitters, regex suite, quantile binning, audio
#       features, corrupt-tolerant JSONL), regression canaries from
#       every earlier family.  FIVE red rows, one shared root cause:
#       uncast SUM() in the oracle SQL (DuckDB HUGEINT → pandas float64
#       in the driver canonicalizer).  All five repaired for r5 with
#       CAST(... AS BIGINT); tools/check_oracle.py now canonicalizes
#       through .df() type-strictly and tests/test_properties.py lints
#       the class registry-wide.
#   r5 window (below): the five r4 repairs first, then new-in-r5
#       (txlog ACID format delta_*, BMP image features, Spark-4 SQL
#       surface, exact-substring dedup), the rows-only→oracled
#       sink_range_sharded upgrade, rounding-fix re-certs
#       (mv_incremental_refresh, udf_pandas_over_window), and the two
#       output-schema-changed suites (fn_array_suite float32 quantize,
#       fn_datetime_suite DATE→TIMESTAMP) — then canaries.
#
# POLICY for new queries: append the name to _FRONT_WINDOW below (displacing
# a canary if the window is full) so the driver certifies it in the round it
# ships.  Never park an unverified query outside the window.
# ---------------------------------------------------------------------------

_FRONT_WINDOW: tuple[str, ...] = (
    # -- r4 red rows, repaired this round (must re-certify).  All five were
    #    one artifact: uncast SUM() in the oracle SQL -> DuckDB HUGEINT ->
    #    pandas float64 ('6.0' vs Spark's '6') in the driver hash.  Fixed by
    #    CAST(... AS BIGINT) at the projection; tools/check_oracle.py now
    #    canonicalizes through .df() like the driver and catches the class,
    #    and tests/test_properties.py lints it registry-wide. -------------
    "mix_domain_reweight",
    "multimodal_audio_features",
    "source_jsonl_corrupt_tolerant",
    "source_python_datasource",
    "source_schema_evolution",
    # -- new in r5 (policy: new queries certify the round they ship) --------
    "delta_merge_upsert",
    "delta_time_travel",
    "delta_delete_where",
    "delta_optimize_compact",
    "multimodal_image_features",
    "sql_recursive_cte",
    "fn_variant_suite",
    "sql_parameterized_args",
    "sql_udf_scalar",
    "dedup_exact_substring_windows",
    "fn_bitwise_suite",
    "fn_url_suite",
    # -- rows-only query upgraded to a full oracle in r5 (deterministic
    #    equal-width shard boundaries replaced RangePartitioner sampling;
    #    text_compression_ratio stays rows-only by design — zlib has no
    #    DuckDB equivalent; pytest pins 100 values against direct zlib) ----
    "sink_range_sharded",
    # -- ADVICE-touched queries, re-certify after the rounding fixes --------
    "mv_incremental_refresh",
    "udf_pandas_over_window",
    # -- r5 output-schema changes (float32 embeddings / DATE-vs-timestamp
    #    canonicalization hardening), must re-certify under the new shape --
    "fn_array_suite",
    "fn_datetime_suite",
    # -- regression canaries from previously-certified families -------------
    "q1_pricing_summary",          # r1 TPC-H
    "q12_shipping_delay_priority", # r1 red -> r3 green; keep watching
    "agg_having",                  # r1 aggregates head
    "join_bucketed_colocated",     # r1 zero-Exchange bucketed join
    "join_asof_purchase_click",    # r1 custom as-of join
    "set_except_all",              # r1 set ops
    "dedup_exact_survivors",       # r2 LLM dedup
    "dedup_minhash_lsh_pairs",     # r2 MinHash+LSH
    "ann_bruteforce_topk",         # r2 ANN baseline
    "text_quality_score",          # r2 text analysis
    "stream_tumbling_window",      # r2 streaming
    "window_topk_per_group",       # r2 window functions
    "udf_pandas_scalar",           # r2 UDF surface
    "sql_command_log_apply",       # r2 reference contract (ordered apply)
    "fn_string_suite",             # r3 function suites
    "fn_math_suite",               # r3 red -> r4 green; keep watching
    "agg_grouping_sets",           # r3 aggregates tail
    "source_csv_roundtrip",        # r3 sources
    "decontam_benchmark_overlap",  # r3 curation
    "join_interval_maintenance",   # r3 interval join
    "dedup_incremental_cross",     # r3 incremental dedup
    "multimodal_feature_extract",  # r3 red -> r4 green; keep watching
    "quality_gopher_rules",        # r4 quality rules
    "join_interval_overlap",       # r4 interval overlap
    "graph_pagerank_trade",        # r4 PageRank
    "scd_merge_apply",             # r4 MERGE apply
    "window_rolling_time_range",   # r4 time-range frame
    "sketch_cms_heavy_hitters",    # r4 CMS
)


def registry() -> dict[str, QuerySpec]:
    """All registered queries, ordered by the certification schedule above."""
    # Import side-effect modules lazily to avoid circular imports.
    from . import (  # noqa: F401
        graph_q,
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
        txlog_q,
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
    if len(_FRONT_WINDOW) > 50:
        # The driver certifies exactly the first 50 registry entries per
        # round; anything past that silently misses certification (the
        # round-4 window listed 52 and dropped its last two canaries).
        raise RuntimeError(
            f"_FRONT_WINDOW has {len(_FRONT_WINDOW)} entries; the driver "
            "only certifies 50 — trim the canary tail")
    ordered = {n: _REGISTRY[n] for n in _FRONT_WINDOW}
    for n, spec in _REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    return ordered
