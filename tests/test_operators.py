"""Operator edge cases on tiny literal DataFrames (FIXTURES.md micro-fixtures):
NULL keys, empty inputs, duplicate keys, rank ties, as-of boundaries,
zero vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from distributed_database_for_sql_spark.functions.text import jaccard, word_shingles
from distributed_database_for_sql_spark.functions.vector import as_double, cosine
from distributed_database_for_sql_spark.operators.asof_join import (
    asof_join_backward,
    asof_join_backward_pandas,
)


def test_join_null_keys_dont_match(spark):
    a = spark.createDataFrame([(1, "x"), (None, "y")], "k int, va string")
    b = spark.createDataFrame([(1, "p"), (None, "q")], "k int, vb string")
    joined = a.join(b, "k")
    assert joined.count() == 1  # SQL semantics: NULL ≠ NULL


def test_agg_null_keys_group_together(spark):
    df = spark.createDataFrame([(None, 1), (None, 2), (1, 3)], "k int, v int")
    rows = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert rows[None] == 3 and rows[1] == 3


def test_empty_input_agg(spark):
    df = spark.createDataFrame([], "k int, v int")
    out = df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert out == []
    glob = df.agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()[0]
    assert glob.n == 0 and glob.s is None


def test_rank_vs_dense_rank_vs_row_number_ties(spark):
    df = spark.createDataFrame(
        [("g", 10), ("g", 10), ("g", 5)], "grp string, v int"
    )
    w = W.partitionBy("grp").orderBy(F.desc("v"))
    out = df.select(
        "v",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    ).collect()
    by_v = sorted([(r.v, r.rnk, r.drnk) for r in out])
    assert by_v == [(5, 3, 2), (10, 1, 1), (10, 1, 1)]
    assert sorted(r.rn for r in out) == [1, 2, 3]


def test_asof_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")], "k int, t int, lv string"
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 9, 90.0)], "k int, t int, rv double"
    ).withColumn("t", F.col("t").cast("timestamp"))
    out = asof_join_backward(
        left, right, on="k", left_ts="t", right_ts="t", right_cols={"rv": "rv"}
    )
    got = {r.lv: r.rv for r in out.collect()}
    # tie at t=10 is inclusive; t=20 sees latest (15); t=5 has no prior → NULL
    assert got == {"L1": 100.0, "L2": 150.0, "L3": None}


def test_asof_join_pandas_variant_matches_window_form(spark):
    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3"), (2, 30, "L4")],
        "k int, t int, lv string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 9, 90.0)], "k int, t int, rv double"
    ).withColumn("t", F.col("t").cast("timestamp"))
    kwargs = dict(on="k", left_ts="t", right_ts="t", right_cols={"rv": "rv"})
    a = {(r.k, r.lv): r.rv for r in asof_join_backward(left, right, **kwargs).collect()}
    b = {(r.k, r.lv): r.rv
         for r in asof_join_backward_pandas(left, right, **kwargs).collect()}
    assert a == b


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    out = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert out[0].c is None
    assert out[1].c == pytest.approx(1.0)


def test_word_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",)], "text string")
    out = df.select(word_shingles(F.col("text")).alias("s")).collect()
    assert out[0].s == ["one two"]           # < w words → whole text
    assert out[1].s == ["a b c", "b c d"]


def test_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [(["x", "y"], ["x", "y"]), (["x"], ["y"])],
        "a array<string>, b array<string>",
    )
    out = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()
    assert out[0].j == 1.0 and out[1].j == 0.0


def test_dedup_duplicate_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k int, v string"
    )
    w = W.partitionBy("k").orderBy("v")
    out = df.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a"), (2, "c")}


def test_salted_join_matches_plain_join(spark):
    from distributed_database_for_sql_spark.operators.salted_join import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k int, lv string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (4, "Z")], "k int, rv string")
    got = sorted(salted_join(left, right, on="k", salt=4).collect())
    want = sorted(left.join(right, "k").collect())
    assert got == want


def test_salted_join_left_outer_keeps_unmatched(spark):
    from distributed_database_for_sql_spark.operators.salted_join import salted_join

    left = spark.createDataFrame([(1, "a"), (9, "z")], "k int, lv string")
    right = spark.createDataFrame([(1, "X")], "k int, rv string")
    rows = {tuple(r) for r in salted_join(left, right, "k", how="left", salt=3).collect()}
    assert (9, "z", None) in rows and (1, "a", "X") in rows
    # Outer rows must not be duplicated per salt replica.
    assert len(rows) == 2


def test_salted_join_anti_matches_plain_and_rejects_right(spark):
    import pytest

    from distributed_database_for_sql_spark.operators.salted_join import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (5, "q"), (9, "z")], "k int, lv string")
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, rv string")
    got = sorted(salted_join(left, right, "k", how="left_anti", salt=4).collect())
    want = sorted(left.join(right, "k", "left_anti").collect())
    assert got == want
    for bad in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="not salt-invariant"):
            salted_join(left, right, "k", how=bad)


def test_interval_point_join_lossless_vs_range_join(spark):
    """Binned equi form == naive range join, including intervals spanning
    several bins and points matching several overlapping intervals; the
    left_interval mode keeps empty intervals with nulled point columns."""
    from distributed_database_for_sql_spark.operators.interval_join import (
        interval_point_join,
    )

    ivl = spark.createDataFrame(
        [("2024-01-01 00:30:00", "2024-01-01 03:30:00", "long"),   # 4 bins
         ("2024-01-01 01:00:00", "2024-01-01 01:10:00", "short"),
         ("2024-01-01 02:50:00", "2024-01-01 03:20:00", "cross"),
         ("2024-01-05 00:00:00", "2024-01-05 01:00:00", "empty")],
        "w_start string, w_end string, name string",
    ).select(F.col("w_start").cast("timestamp"),
             F.col("w_end").cast("timestamp"), "name")
    pts = spark.createDataFrame(
        [("2024-01-01 00:45:00", 1), ("2024-01-01 01:05:00", 2),
         ("2024-01-01 03:00:00", 3), ("2024-01-01 03:29:59", 4),
         ("2024-01-01 03:30:00", 5),  # end is exclusive
         ("2024-01-02 12:00:00", 6)],
        "ts string, pid int",
    ).select(F.col("ts").cast("timestamp"), "pid")

    got = {(r.name, r.pid) for r in interval_point_join(
        ivl, pts, "w_start", "w_end", "ts", bin_seconds=3600).collect()}
    want = {(r.name, r.pid) for r in pts.join(
        ivl, (pts.ts >= ivl.w_start) & (pts.ts < ivl.w_end)).collect()}
    assert got == want
    assert ("long", 3) in got and ("cross", 3) in got  # overlap both
    assert ("long", 5) not in got  # exclusive end

    left = interval_point_join(ivl, pts, "w_start", "w_end", "ts",
                               bin_seconds=3600, how="left_interval")
    rows = {(r.name, r.pid) for r in left.collect()}
    assert ("empty", None) in rows
    assert {(n, p) for n, p in rows if p is not None} == want


def test_interval_left_join_duplicate_spans_are_distinct_rows(spark):
    """Interval identity is the row, not the (start, end) span: two
    intervals sharing an identical span but differing elsewhere must each
    survive left_interval independently — one matching points, one empty,
    and two all-empty duplicates must both appear."""
    from distributed_database_for_sql_spark.operators.interval_join import (
        interval_point_join,
    )

    ivl = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", "res_a"),
         ("2024-01-01 00:00:00", "2024-01-01 01:00:00", "res_b"),
         ("2024-01-09 00:00:00", "2024-01-09 01:00:00", "dup_1"),
         ("2024-01-09 00:00:00", "2024-01-09 01:00:00", "dup_2")],
        "w_start string, w_end string, name string",
    ).select(F.col("w_start").cast("timestamp"),
             F.col("w_end").cast("timestamp"), "name")
    pts = spark.createDataFrame(
        [("2024-01-01 00:30:00", 1)], "ts string, pid int",
    ).select(F.col("ts").cast("timestamp"), "pid")

    rows = [(r.name, r.pid) for r in interval_point_join(
        ivl, pts, "w_start", "w_end", "ts",
        bin_seconds=3600, how="left_interval").collect()]
    # Both same-span intervals match the point; both all-empty duplicates
    # appear exactly once each with nulled point columns.
    assert sorted(rows) == [("dup_1", None), ("dup_2", None),
                            ("res_a", 1), ("res_b", 1)]


def test_connected_components_chain_and_islands(spark):
    from distributed_database_for_sql_spark.operators.components import (
        connected_components,
    )

    # Chain 1-2-3-4 (diameter 3), pair {10,11}, and 20-21-22 triangle.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10),
            (20, 20), (21, 20), (22, 20)}
    assert got == want


def test_sample_seeded_deterministic_and_bounded(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    a = orders.sample(fraction=0.1, seed=42).select("o_orderkey").collect()
    b = orders.sample(fraction=0.1, seed=42).select("o_orderkey").collect()
    assert [r.o_orderkey for r in a] == [r.o_orderkey for r in b]  # same seed, same rows
    keys = {r.o_orderkey for r in a}
    all_keys = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    assert keys <= all_keys                      # a sample is a subset
    assert 0.02 * n < len(a) < 0.25 * n          # loose Bernoulli bounds
    c = orders.sample(fraction=0.1, seed=7).select("o_orderkey").collect()
    assert [r.o_orderkey for r in c] != [r.o_orderkey for r in a]  # seed matters


def test_sessionize_partitions_events_and_durations_nonnegative(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.queries import registry

    events = load_table(spark, sf_dir, "events")
    sess = registry()["ts_sessionize_batch"].fn(spark, sf_dir)
    rows = sess.collect()
    # sessions exactly partition the events of each user
    assert sum(r.n_events for r in rows) == events.count()
    assert all(r.dur_us >= 0 for r in rows)
    assert all(r.n_events >= 1 for r in rows)
    # session ids are 1..k dense per user
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.session_id)
    for ids in by_user.values():
        assert sorted(ids) == list(range(1, len(ids) + 1))


def test_gapfill_spine_is_dense_and_counts_conserve(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.queries import registry
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    filled = registry()["ts_rollup_gapfill"].fn(spark, sf_dir)
    rows = filled.collect()
    n_types = events.select("event_type").distinct().count()
    buckets_per_type = len({r.bucket for r in rows})
    assert len(rows) == n_types * buckets_per_type  # dense grid
    assert sum(r.n for r in rows) == events.count()  # counts conserved
    # gap rows exist and carry exact zeros
    gaps = [r for r in rows if r.n == 0]
    assert gaps and all(r.sv == 0.0 for r in gaps)


def test_range_sharded_sink_disjoint_sorted_complete(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.queries import registry
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    stats = registry()["sink_range_sharded"].fn(spark, sf_dir).collect()
    # every row landed in exactly one shard
    assert sum(r.n_docs for r in stats) == docs.count()
    # shard key ranges are disjoint and ordered
    for a, b in zip(stats, stats[1:]):
        assert a.max_id < b.min_id
    # rows are sorted inside each shard file
    from distributed_database_for_sql_spark.queries.sources_q import _stage_dir
    path = _stage_dir("range_sharded_docs", sf_dir)
    per_file = (
        spark.read.parquet(path)
        .select("doc_id", F.input_file_name().alias("f"))
        .groupBy("f").agg(F.collect_list("doc_id").alias("ids"))
    )
    for r in per_file.collect():
        assert list(r.ids) == sorted(r.ids)


def test_stratified_sample_deterministic_and_proportional(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.1, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.9}
    a = docs.sampleBy("lang", fractions, seed=42)
    b = docs.sampleBy("lang", fractions, seed=42)
    assert sorted(r.doc_id for r in a.collect()) == \
        sorted(r.doc_id for r in b.collect())
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in
           a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in fractions.items():
        n, k = totals[lang], got.get(lang, 0)
        # loose Bernoulli bounds: within ±4·sqrt(n·f·(1−f)) of the mean
        import math
        slack = 4 * math.sqrt(n * frac * (1 - frac)) + 1
        assert abs(k - n * frac) <= slack, (lang, k, n, frac)


def test_interval_overlap_join_matches_naive(spark, sf_dir):
    """Binned overlap join == naive theta join, with no duplicate pairs
    (the first-shared-bin filter must stand in exactly for DISTINCT)."""
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.operators.overlap_join import (
        interval_overlap_join,
    )

    events = load_table(spark, sf_dir, "events")
    ivl = (
        events.select(F.date_trunc("hour", "ts").alias("h")).distinct()
        .select(F.expr("h + INTERVAL 30 MINUTES").alias("w_start"),
                F.expr("h + INTERVAL 90 MINUTES").alias("w_end"))
    )
    spans = (
        events.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(F.min("ts").alias("s_start"),
             F.expr("max(ts) + INTERVAL 1 MINUTE").alias("s_end"))
    )
    got = interval_overlap_join(
        ivl, spans, "w_start", "w_end", "s_start", "s_end",
        bin_seconds=3600,
    ).select("w_start", "user_id", "d").collect()
    naive = (
        ivl.join(spans, (F.col("s_start") < F.col("w_end"))
                 & (F.col("w_start") < F.col("s_end")))
        .select("w_start", "user_id", "d").collect()
    )
    got_t = [(r.w_start, r.user_id, r.d) for r in got]
    naive_t = [(r.w_start, r.user_id, r.d) for r in naive]
    assert len(got_t) == len(set(got_t)), "duplicates leaked through"
    assert sorted(got_t) == sorted(naive_t)


def test_pagerank_fixed_matches_manual_iteration(spark):
    """pagerank_fixed on a hand-built 4-node graph equals the same
    recurrence computed in plain Python, and ranks stay a (leaky)
    distribution: every rank >= teleport, total <= 1."""
    from distributed_database_for_sql_spark.operators.pagerank import (
        pagerank_fixed,
    )

    # 1->2 (w2), 1->3 (w1), 2->3 (w1), 3->1 (w1); node 4 only receives.
    edge_rows = [(1, 2, 2.0), (1, 3, 1.0), (2, 3, 1.0), (3, 1, 1.0),
                 (3, 4, 3.0)]
    edges = spark.createDataFrame(edge_rows, ["src", "dst", "weight"])
    got = {r.node: r.rank
           for r in pagerank_fixed(edges, iterations=3,
                                   damping=0.85).collect()}

    n, d = 4, 0.85
    ranks = {v: 1.0 / n for v in (1, 2, 3, 4)}
    out = {1: 3.0, 2: 1.0, 3: 4.0}
    for _ in range(3):
        nxt = {v: (1 - d) / n for v in ranks}
        for s, t, w in edge_rows:
            nxt[t] += d * ranks[s] * w / out[s]
        ranks = nxt
    for v in ranks:
        assert got[v] == pytest.approx(ranks[v], rel=1e-12), v
    assert sum(got.values()) <= 1.0 + 1e-9
    assert all(r >= (1 - d) / n - 1e-12 for r in got.values())


def test_interval_overlap_join_half_open_boundaries(spark):
    """Half-open [s, e) semantics at exact bin boundaries: touching
    intervals (a.end == b.start) must NOT match; nested and
    bin-straddling intervals must match exactly once."""
    from datetime import datetime

    from distributed_database_for_sql_spark.operators.overlap_join import (
        interval_overlap_join,
    )

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [("touch", ts(1), ts(2)),        # ends exactly where r1 starts
         ("strad", ts(1, 30), ts(3, 30)),  # spans 3 bin boundaries
         ("nest", ts(4), ts(8))],
        ["lid", "ls", "le"])
    right = spark.createDataFrame(
        [("r1", ts(2), ts(3)),
         ("r2", ts(2, 45), ts(2, 50)),   # inside strad only
         ("r3", ts(5), ts(6))],          # nested inside nest
        ["rid", "rs", "re"])
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_seconds=3600).collect())
    assert got == [("nest", "r3"), ("strad", "r1"), ("strad", "r2")]


def test_cms_estimate_is_one_sided(spark, sf_dir):
    """CMS never underestimates: est >= exact for every corpus term, and
    the sketch built from two half-corpora merged bucket-wise equals the
    whole-corpus sketch (mergeability)."""
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.operators.cms import (
        cms_estimate, cms_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    exact = tok.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    table = cms_table(tok, "term", depth=3, width=64)
    est = cms_estimate(table, exact.select("term"), "term",
                       depth=3, width=64)
    joined = exact.join(est, "term").collect()
    assert joined and all(r.cms_est >= r.exact_cnt for r in joined)

    half_a = cms_table(tok.filter(F.col("doc_id") % 2 == 0), "term",
                       depth=3, width=64)
    half_b = cms_table(tok.filter(F.col("doc_id") % 2 == 1), "term",
                       depth=3, width=64)
    merged = (half_a.unionByName(half_b).groupBy("j", "b")
              .agg(F.sum("cnt").alias("cnt")))
    whole = {(r.j, r.b): r.cnt for r in table.collect()}
    assert {(r.j, r.b): r.cnt for r in merged.collect()} == whole
