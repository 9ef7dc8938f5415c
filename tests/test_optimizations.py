"""Pins for the r14 optimization round's engine-internal changes.

Three behaviors changed for performance and are pinned here so a
regression is caught as a failure, not a silent slowdown:

1. Snapshot reads use the log's schema (never mergeSchema): building a
   read plan launches ZERO Spark jobs — previously every `_read_active`
   ran a footer-merging job over all active files (O(files) I/O per
   read at 100 TB).
2. Merge/fold statements persist their bounded source batch: an
   expensive source plan is EVALUATED ONCE per statement, not once per
   internal pass (key-range stats, decision join, write, CDF) — pinned
   with an accumulator-instrumented source.
3. The catalog's lazy-plan cache serves the same DataFrame object for
   unchanged testdata and re-resolves when the file changes (mtime/size
   fingerprint) — a plan cache, never a result cache.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_database_for_sql_spark.sources.txlog import TxLogTable


def _jobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def test_snapshot_read_plan_is_metadata_only(spark, tmp_path):
    """t.read() must not launch a Spark job at plan-construction time
    (the old mergeSchema path ran a footer merge over every active
    file); evolution still reads correctly (NULL backfill)."""
    t = TxLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.append(spark.createDataFrame([(3, "c", 9)],
                                   "k int, v string, extra int"))
    before = _jobs(spark)
    df = t.read()
    assert _jobs(spark) == before, \
        "snapshot read launched a Spark job during plan construction"
    rows = {(r["k"], r["v"], r["extra"]) for r in df.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 9)}


def test_merge_source_evaluated_once(spark, tmp_path):
    """merge_upsert pins its update batch: a source instrumented with an
    accumulator is evaluated exactly once (the persist materialization),
    not once per internal pass."""
    t = TxLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(i, 0) for i in range(10)],
                              "k int, v int"),
        enable_cdf=True)
    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def tick(v):
        acc.add(1)
        return v

    updates = (spark.createDataFrame([(5, 1), (11, 1)], "k int, v int")
               .withColumn("v", tick("v")))
    t.merge_upsert(updates, "k")
    # one evaluation = 2 rows through the UDF; the pre-persist code ran
    # the batch through every pass (stats, probe, rewrite, CDF) => ~8+
    assert acc.value <= 4, \
        f"merge source evaluated {acc.value / 2:.0f}x — persist regressed"
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(i, 0) for i in range(10) if i != 5} | {(5, 1), (11, 1)}


def test_merge_full_source_evaluated_once(spark, tmp_path):
    """Same single-evaluation pin for the three-arm merge_full (the MV
    refresh fold path)."""
    t = TxLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        enable_cdf=True)
    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def tick(v):
        acc.add(1)
        return v

    src = (spark.createDataFrame([(2, 21), (3, 30)], "k int, v int")
           .withColumn("v", tick("v")))
    t.merge_full(
        src, "k",
        when_matched=[{"action": "update", "set": "*"}],
        when_not_matched=[{"action": "insert", "values": "*"}],
        when_not_matched_by_source=[{"action": "delete"}])
    assert acc.value <= 4, \
        f"merge_full source evaluated {acc.value / 2:.0f}x — persist regressed"
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(2, 21), (3, 30)}


def test_catalog_plan_cache_invalidates_on_data_change(spark, sf_dir,
                                                       tmp_path):
    """load_table reuses the lazy plan for unchanged bytes and
    re-resolves when the file's fingerprint moves — never a stale (or
    result-) cache."""
    import shutil

    from distributed_database_for_sql_spark.catalog import load_table

    d = str(tmp_path / "sf")
    os.makedirs(d)
    shutil.copy(os.path.join(sf_dir, "region.parquet"),
                os.path.join(d, "region.parquet"))
    a = load_table(spark, d, "region")
    b = load_table(spark, d, "region")
    assert a is b, "unchanged fingerprint must reuse the plan object"
    n = a.count()
    os.utime(os.path.join(d, "region.parquet"))  # fingerprint moves
    c = load_table(spark, d, "region")
    assert c is not a, "changed fingerprint must re-resolve"
    assert c.count() == n


def test_scd2_fold_batch_evaluated_once(spark, tmp_path):
    """apply_changes_scd2 pins the change batch through the shim: the
    transport plan runs once, not once per fold pass."""
    t = TxLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame(
            [], "k int, v int, __START_AT long, __END_AT long"),
        enable_cdf=True)
    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def tick(v):
        acc.add(1)
        return v

    batch = (spark.createDataFrame(
        [(1, 10, 100, "upsert"), (1, 11, 200, "upsert"),
         (2, 20, 150, "upsert")],
        "k int, v int, seq long, _change_type string")
        .withColumn("v", tick("v")))
    t.apply_changes_scd2(batch, key="k", sequence_by="seq")
    assert acc.value <= 6, \
        f"SCD2 batch evaluated {acc.value / 3:.0f}x — persist regressed"
    open_rows = {(r["k"], r["v"])
                 for r in t.read().filter(F.col("__END_AT").isNull())
                 .collect()}
    assert open_rows == {(1, 11), (2, 20)}


def test_timestamp_merge_key_pruning_is_sound(spark, tmp_path):
    """ADVICE r14 (high): timestamp merge keys must not be wrongly
    pruned.  Batch bounds are coerced by _json_key and compared against
    footer stats recorded by _stat_value; before the fix _json_key used
    str(datetime) (space separator) while _stat_value used isoformat
    ('T'), and since ' ' < digits < 'T' a same-day comparison inverted —
    the file holding the matched key was pruned and the merge silently
    INSERTED a duplicate instead of updating."""
    import datetime as dt

    t = TxLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 5, 0), 0),
             (dt.datetime(2024, 1, 1, 20, 0), 0)],
            "ts timestamp, v int"))
    # the probe machinery itself: batch bounds INSIDE the file's
    # same-day min/max must keep the file
    ranges, had_nulls = t._key_range_stats(
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 10, 0),),
             (dt.datetime(2024, 1, 1, 20, 0),)], "ts timestamp"),
        ["ts"], "MERGE")
    assert not had_nulls
    cand = t._key_probe_candidates(ranges)
    assert cand, "file wrongly pruned for an in-range timestamp key"
    # end-to-end: 20:00 must be UPDATED (matched), 10:00 inserted
    upd = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 0), 1),
         (dt.datetime(2024, 1, 1, 20, 0), 2)],
        "ts timestamp, v int")
    t.merge_upsert(upd, "ts")
    got = sorted((r["ts"], r["v"]) for r in t.read().collect())
    assert got == [
        (dt.datetime(2024, 1, 1, 5, 0), 0),
        (dt.datetime(2024, 1, 1, 10, 0), 1),
        (dt.datetime(2024, 1, 1, 20, 0), 2),
    ], f"duplicate/missing rows after timestamp-key merge: {got}"


def test_sql_predicate_triples_translator():
    """Pure-function pins for the SQL→(col,op,value) translator feeding
    UPDATE/DELETE probe pruning.  Soundness rules: OR/NOT void the
    parse; an un-modeled conjunct in an AND chain is skipped (subset of
    conjuncts is still sound); quoted literals shield keywords."""
    from distributed_database_for_sql_spark.sources.txlog import (
        sql_predicate_triples as t)

    assert t("o_orderpriority = '1-URGENT'") == [
        ("o_orderpriority", "=", "1-URGENT")]
    assert t("a <= 1000 AND b = 'x AND y'") == [
        ("a", "<=", 1000), ("b", "=", "x AND y")]
    assert t("1000 >= a") == [("a", "<=", 1000)]
    assert t("a < 5 AND weird_func(b) = 3") == [("a", "<", 5)]
    assert t("name = 'it''s'") == [("name", "=", "it's")]
    assert t("price > 2.5") == [("price", ">", 2.5)]
    assert t("a != 5 AND b = 2") == [("b", "=", 2)]
    # everything here must void or skip to stay sound
    assert t("o_orderkey % 11 = 0") == []
    assert t("a < 5 OR b > 2") == []
    assert t("NOT a = 5") == []
    assert t("a = 5 AND b = 3 OR c = 1") == []
    assert t("a BETWEEN 1 AND 5") == []
    assert t("a IN (1,2)") == []
    assert t("a IS NULL") == []
    assert t("a = 'unterminated") == []
    assert t(None) == []


def test_update_delete_probe_pruning(spark, tmp_path):
    """update_where/delete_where with prune triples touch only files
    whose stats could match, with identical results; timestamp-string
    literals are coerced to the stats' ISO domain (soundness)."""
    import datetime as dt

    rows = [(i, f"g{i % 2}", dt.datetime(2024, 1, 1 + i // 100, 12, 0), 0)
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "k int, g string, ts timestamp, v int").repartition(3, "k")
    t = TxLogTable.create(spark, str(tmp_path / "t"),
                          df.sortWithinPartitions("k"))
    # prune probe: k <= 5 must keep a strict subset of the 3 files
    kept, total = t.prune_files([("k", "<=", 5)])
    assert total == 3 and 1 <= len(kept) <= 2
    t.update_where({"v": "v + 7"}, F.col("k") <= 5, prune=[("k", "<=", 5)])
    t.delete_where(F.col("k") == 7, prune=[("k", "=", 7)])
    got = {(r["k"], r["v"]) for r in t.read().select("k", "v").collect()}
    want = {(i, 7 if i <= 5 else 0) for i in range(300) if i != 7}
    assert got == want
    # timestamp-string coercion: space-separated literal against the
    # isoformat footer stats must NOT prune the matching day's file
    kept, _ = t.prune_files([("ts", ">=", "2024-01-03 00:00:00")])
    assert kept, "same-day timestamp-string probe wrongly pruned all files"


def test_read_changes_plan_is_metadata_only(spark, tmp_path):
    """read_changes must not launch Spark jobs at plan-construction time
    (the old per-commit mergeSchema reads each ran a footer merge);
    rename handling is preserved (logical-at-end names)."""
    t = TxLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        enable_cdf=True)
    t.merge_upsert(spark.createDataFrame([(2, "B"), (3, "c")],
                                         "k int, v string"), "k")
    t.rename_column("v", "val")
    t.append(spark.createDataFrame([(4, "d")], "k int, val string"))
    before = _jobs(spark)
    df = t.read_changes(0)
    assert _jobs(spark) == before, \
        "read_changes launched a Spark job during plan construction"
    got = {(r["k"], r["val"], r["_change_type"], r["_commit_version"])
           for r in df.collect()}
    assert got == {
        (1, "a", "insert", 0), (2, "b", "insert", 0),
        (2, "b", "update_preimage", 1), (2, "B", "update_postimage", 1),
        (3, "c", "insert", 1), (4, "d", "insert", 3),
    }
