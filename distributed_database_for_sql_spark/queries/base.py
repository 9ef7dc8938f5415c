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
#   r5 window: the five r4 repairs first, then new-in-r5
#       (txlog ACID format delta_*, BMP image features, Spark-4 SQL
#       surface, exact-substring dedup), the rows-only→oracled
#       sink_range_sharded upgrade, rounding-fix re-certs
#       (mv_incremental_refresh, udf_pandas_over_window), and the two
#       output-schema-changed suites (fn_array_suite float32 quantize,
#       fn_datetime_suite DATE→TIMESTAMP) — then canaries.  ALL 50 GREEN
#       (first zero-red round since r2).
#   r6 window (below): the stale-certification drain begins (VERDICT r5
#       item 3: 86 queries' latest green was r1/r2 and the driver
#       regenerates testdata between rounds).  Positions 1-34 are the
#       r6 new/changed queries (twenty-five brand-new — the completed
#       lakehouse-protocol surface [idempotent txn sink, constraints,
#       clone, zorder, streaming MV, metadata count, generated columns,
#       bloom index, convert, table stream, column mapping] plus the
#       BPE encode/data-skipping/CDF/DV/RESTORE/partitioning block and
#       the tokenizer/chunking/HLL ops — one rows-only→oracled upgrade,
#       one schema change, six re-certs of behavior-touched paths);
#       positions 35-50 re-front the oldest r1-certified TPC-H queries
#       (q2-q18, excluding the r3-re-certified q12).  The remaining r1/r2-stale queries (q20-q22, the
#       join/set/relational core, aggregates tail, windows, streaming,
#       text, subqueries, time-series, UDF, the displaced canaries) are
#       the planned r7 drain window — new-query certification takes
#       precedence per the policy below.
#
# POLICY for new queries: append the name to _FRONT_WINDOW below (displacing
# a canary if the window is full) so the driver certifies it in the round it
# ships.  Never park an unverified query outside the window.
# ---------------------------------------------------------------------------

#   r8 window (below): finish the staleness drain — after this window
#       certifies, NO query's latest driver green predates r3, and the
#       only ≤r3 ones left are the freshest r3 family reruns that did
#       not fit (none: all 20 remaining r2-stale AND all 28 r3-stale
#       queries fit in 48 slots).  Positions 1-2: new in r8
#       (delta_cdf_after_rename — CDF correctness across RENAME COLUMN,
#       the ADVICE r7 high fix, certified the round it ships).
#       Positions 3-22: the full remaining r2-stale block (text family
#       ×7, ts ×3, r2 dedup ×4, ann_partition_pruned_topk,
#       embedding_near_dup_pairs, dedup_connected_components,
#       pipeline_training_data_curation, profile_corpus_stats,
#       sql_cte_window, stream_session_window).  Positions 30-50: every
#       r3-certified query but the seven displaced canaries (agg percentiles/pivot/argmax/global, fn
#       suites, multimodal ×4, sources round-trips ×4, curation
#       pack/split/quality/pii/tfidf/repetition, stream interval join,
#       token histogram, dedup_rate_by_source).

#   r9 window (below): close the certification ledger.  Positions 1-4:
#       new in r9 (MERGE schema evolution, full-clause MERGE × BY
#       DEFAULT identity, SCD2 sequenced backfill, composite-key MERGE
#       — certified the round they ship).  Positions 5-17: the thirteen
#       r3-stale canaries the r8 new-query policy displaced (the ONLY
#       queries whose latest driver green predates r4).  Positions
#       18-32: every r4-certified query.  After this window certifies:
#       zero queries with latest green ≤ r4.  Rest: eighteen
#       r5-certified canaries (oldest remaining, drawn across
#       families).

#   r10 window (below): drain the LAST staleness tier.  Position 1: new
#       in r10 (delta_materialized_view_minmax — the widened MV
#       aggregate class, certified the round it ships).  Positions 2-35:
#       ALL 34 queries whose latest driver green is r5 (the only
#       remaining tier; every one re-verified locally at sf0.01 this
#       round).  Positions 36-50: fifteen r6-certified canaries across
#       families.  After this window certifies: min latest-driver-green
#       = r6 over every oracled query.

#   r13 window: pay down the certification debt the r12 verdict
#       flagged as its top item — the driver window stayed frozen on the
#       r10 list through r11 and r12, so the six r11 queries and six r12
#       queries shipped without a driver-green row (violating the policy
#       above; each was locally 249/249-oracled, but the bar is a
#       CORRECTNESS row).  Positions 1-12: those twelve, fronted at
#       last.  Positions 13-49: the ENTIRE r6-latest tier (37 queries —
#       the oldest remaining; after this window certifies, min
#       latest-driver-green = r7 over all previously-certified queries).
#       Position 50: new in r13 (delta_uniform_iceberg_export, certified
#       the round it ships — it displaced the one canary slot).  A lint
#       (tests/test_properties.py::test_new_queries_are_in_front_window)
#       now enforces the policy mechanically — any registered query
#       absent from every CORRECTNESS_r*.json must be in the window.
#
#   r14 window (below): rotate to the r7-latest tier — after r13
#       certified, the 50 queries whose newest driver green is r7 are
#       the oldest remaining tier (tiers: 50 each at r7/r8/r9/r12/r13).
#       Any new-in-r14 queries displace tail canaries per the linted
#       policy; after this window certifies, min latest-driver-green
#       advances to r8 over every previously-certified query.

#   r15 window (below): optimization round — one new query (the
#       scaling-sensitive bench probe, certified the round it ships per
#       the linted policy), then the seven r7-latest queries the r14
#       new-query block displaced (the promised "r15 drain"; the oldest
#       remaining tier), then 42 of the 50 r8-latest queries in
#       registry-sorted order.  The eight r8 stragglers
#       (text_langid_heuristic, text_langid_ngram_profile,
#       text_token_count_bpe, text_token_stats, text_word_freq_topk,
#       ts_funnel_signup_click_purchase, ts_locf_interpolation,
#       ts_rollup_gapfill) lead the r16 drain.  After this window
#       certifies, min latest-driver-green advances to r8.

_FRONT_WINDOW: tuple[str, ...] = (
    # -- new in r15 ---------------------------------------------------------
    "scaling_probe_hash_mix",
    # -- the r14-displaced r7 tier (oldest remaining) -----------------------
    "stream_static_join",
    "udtf_tokenize_positions",
    "window_first_last",
    "window_lag_lead",
    "window_range_frame",
    "window_ranking",
    "window_running_frames",
    # -- stale drain X: the r8-latest tier (42 of 50) ------------------------
    "agg_approx_percentile",
    "agg_argmax_struct",
    "agg_global_stats",
    "agg_percentiles",
    "agg_pivot",
    "agg_unpivot",
    "ann_partition_pruned_topk",
    "decontam_embedding_overlap",
    "dedup_cluster_representative",
    "dedup_connected_components",
    "dedup_minhash_signature",
    "dedup_ngram_jaccard_blocked",
    "dedup_rate_by_source",
    "dedup_simhash",
    "dedup_span_removal",
    "delta_apply_changes",
    "delta_apply_changes_scd2",
    "delta_cdf_after_rename",
    "delta_copy_into",
    "delta_dv_update",
    "delta_identity_columns",
    "delta_insert_overwrite",
    "delta_merge_full_clauses",
    "delta_reorg_purge",
    "delta_row_tracking",
    "delta_streaming_scd2",
    "embedding_near_dup_pairs",
    "fn_array_hof_suite",
    "fn_conditional_suite",
    "fn_json_suite",
    "fn_map_suite",
    "multimodal_frame_sample",
    "multimodal_image_meta_udf",
    "multimodal_payload_meta",
    "multimodal_resize",
    "pipeline_training_data_curation",
    "profile_corpus_stats",
    "split_leakage_free",
    "sql_cte_window",
    "stream_session_window",
    "text_bigram_topk_per_lang",
    "text_fingerprint",
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
