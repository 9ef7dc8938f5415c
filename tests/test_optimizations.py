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
