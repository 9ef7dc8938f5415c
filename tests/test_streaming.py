"""Streaming semantics that need multi-batch replay: watermark late-data
drops, stateful dedup across batches, ordered exactly-once command apply
(SURVEY.md §5.2.4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row arriving behind the watermark is dropped from an append-mode
    windowed aggregation."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    # Batch 1: events at 10:00-10:04, plus one at 12:00 advancing the clock.
    _write_batch(spark, src, [
        (1, "2024-01-01 10:00:00", 1, 1.0),
        (2, "2024-01-01 10:04:00", 1, 1.0),
        (3, "2024-01-01 12:00:00", 1, 1.0),
    ])

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
    )
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("late_test").option("checkpointLocation", ckpt).start())
    q.processAllAvailable()

    # Batch 2: a LATE row at 10:01 — watermark is already 11:50.
    _write_batch(spark, src, [(4, "2024-01-01 10:01:00", 1, 99.0)])
    q.processAllAvailable()
    # Batch 3: advance event time far enough to close every window.
    _write_batch(spark, src, [(5, "2024-01-01 14:00:00", 1, 1.0)])
    q.processAllAvailable()
    q.stop()

    out = {(r["window"].start.strftime("%H:%M"), r.n)
           for r in spark.table("late_test").collect()}
    # the 10:00 window still counts 2 — the late row never joined it
    assert ("10:00", 2) in out
    assert ("10:00", 3) not in out


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, "2024-01-01 10:00:00", 1, 1.0),
                              (2, "2024-01-01 10:01:00", 1, 1.0)])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    dedup = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    q = (dedup.writeStream.outputMode("append").format("memory")
         .queryName("dedup_test").option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    # same event_id arrives again in a later batch → must not duplicate
    _write_batch(spark, src, [(2, "2024-01-01 10:02:00", 1, 1.0),
                              (3, "2024-01-01 10:03:00", 1, 1.0)])
    q.processAllAvailable()
    q.stop()
    ids = sorted(r.event_id for r in spark.table("dedup_test").collect())
    assert ids == [1, 2, 3]


def test_command_log_exactly_once_replay(spark, sf_dir, tmp_path):
    """CommandLog applies appended SQL commands in order, and a second
    replay (fresh query, same checkpoint) applies nothing new."""
    from distributed_database_for_sql_spark.engine import CommandLog, Engine

    eng = Engine(spark, sf_dir)
    log = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    log.append(
        "CREATE OR REPLACE TEMP VIEW cmd_v1 AS SELECT COUNT(*) AS n FROM lineitem",
        "CREATE OR REPLACE TEMP VIEW cmd_v2 AS SELECT n * 2 AS n2 FROM cmd_v1",
    )
    applied = log.replay()
    assert [a[1] for a in applied] == [0, 1]  # in order
    assert spark.table("cmd_v2").collect()[0].n2 == \
           2 * spark.table("cmd_v1").collect()[0].n

    again = log.replay()
    assert again == []  # checkpoint: nothing re-applied

    log.append("CREATE OR REPLACE TEMP VIEW cmd_v3 AS SELECT 1 AS one")
    third = log.replay()
    assert len(third) == 1 and third[0][2].endswith("SELECT 1 AS one")


def test_command_log_crash_redelivery_idempotent(spark, sf_dir, tmp_path):
    """Simulated crash-before-checkpoint-commit: wiping the checkpoint
    forces the stream to re-deliver every batch; the applied-batch markers
    must suppress re-execution (foreachBatch alone is at-least-once)."""
    import shutil

    from distributed_database_for_sql_spark.engine import CommandLog, Engine

    eng = Engine(spark, sf_dir)
    log = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    log.append("CREATE OR REPLACE TEMP VIEW crash_v AS SELECT 41 + 1 AS n")
    assert len(log.replay()) == 1

    # Crash simulation: checkpoint lost, log + ledger survive.
    shutil.rmtree(tmp_path / "ckpt")
    log2 = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    assert log2.replay() == []  # re-delivered statement skipped by ledger


def test_command_log_mid_batch_crash_applies_each_statement_once(
        spark, sf_dir, tmp_path):
    """A crash in the middle of a batch (engine.sql raising after the
    first statement) must not double-apply on replay: the per-statement
    ledger skips the committed statement and applies only the rest."""
    from distributed_database_for_sql_spark.engine import CommandLog, Engine

    eng = Engine(spark, sf_dir)
    executed = []
    real_sql = eng.sql

    def crashing_sql(cmd):
        if len(executed) == 1:
            raise RuntimeError("simulated crash after first statement")
        executed.append(cmd)
        return real_sql(cmd)

    log = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    log.append(
        "CREATE OR REPLACE TEMP VIEW mid_v1 AS SELECT 1 AS n",
        "CREATE OR REPLACE TEMP VIEW mid_v2 AS SELECT n + 1 AS n FROM mid_v1",
        "CREATE OR REPLACE TEMP VIEW mid_v3 AS SELECT n + 1 AS n FROM mid_v2",
    )
    eng.sql = crashing_sql
    with pytest.raises(Exception):
        log.replay()
    assert len(executed) == 1  # crashed before statement 1 executed

    # Recovery run: statement 0 is in the ledger and must be skipped;
    # statements 1 and 2 apply now.  Overall each applied exactly once.
    eng.sql = lambda cmd: (executed.append(cmd), real_sql(cmd))[1]
    recovered = log.replay()
    assert [(s, i) for s, i, _ in recovered] == [(0, 1), (0, 2)]
    assert len(executed) == 3 and len(set(executed)) == 3  # once each
    assert spark.table("mid_v3").collect()[0].n == 3


def test_command_log_lost_checkpoint_applies_new_files_delta(
        spark, sf_dir, tmp_path):
    """Lost checkpoint + surviving ledger + NEWLY appended commands: the
    re-planned first batch spans old and new files; the per-statement
    ledger must apply exactly the new commands, not skip the whole
    batch (and not re-apply the old ones)."""
    import shutil

    from distributed_database_for_sql_spark.engine import CommandLog, Engine

    eng = Engine(spark, sf_dir)
    log = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    log.append("CREATE OR REPLACE TEMP VIEW delta_v1 AS SELECT 10 AS n")
    assert len(log.replay()) == 1

    shutil.rmtree(tmp_path / "ckpt")  # crash loses checkpoint, not ledger
    log2 = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    log2.append(
        "CREATE OR REPLACE TEMP VIEW delta_v2 AS SELECT n * 2 AS n FROM delta_v1")
    applied = log2.replay()
    assert [(s, i) for s, i, _ in applied] == [(1, 0)]  # only the delta
    assert spark.table("delta_v2").collect()[0].n == 20


def test_command_log_seq_ignores_tmp_files(spark, sf_dir, tmp_path):
    """A .tmp file left by a crashed append must not advance _seq (it
    would wrongly skip the first-run guard) and must be overwritten by
    the next committed append."""
    from distributed_database_for_sql_spark.engine import CommandLog, Engine

    eng = Engine(spark, sf_dir)
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    (log_dir / "cmd_00000000.json.tmp").write_text("{partial")
    log = CommandLog(eng, str(log_dir), str(tmp_path / "ckpt"))
    assert log._seq == 0
    log.append("CREATE OR REPLACE TEMP VIEW tmp_v AS SELECT 1 AS one")
    assert (log_dir / "cmd_00000000.json").exists()
    assert log._seq == 1


def test_stateful_user_agg_matches_batch(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.streaming.jobs import user_running_state
    from pyspark.sql import functions as F

    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in user_running_state(spark, sf_dir, max_users=10).collect()
    }
    want = {
        (r.user_id, r.n_events, r.total_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") < 10)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value"))
        ).collect()
    }
    assert got == want


def test_txlog_cdf_streaming_source_incremental(spark, tmp_path):
    """The txlogcdf streaming source must (a) deliver the existing change
    history as its first batches and (b) pick up commits made WHILE the
    stream is running — offsets are commit versions, so each new commit
    becomes exactly one new slice of change rows."""
    import tempfile
    import uuid as _uuid

    from pyspark.sql import functions as F

    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        register_txlog_cdf_source,
    )

    d = str(tmp_path / "tbl")
    t = TxLogTable.create(
        spark, d,
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "k int, grp string, v int"),
        enable_cdf=True)
    register_txlog_cdf_source(spark)
    stream = spark.readStream.format("txlogcdf").option("path", d).load()
    name = f"cdf_{_uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName(name)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .start())
    try:
        q.processAllAvailable()
        first = {(r["_change_type"], r["_commit_version"], r["k"])
                 for r in spark.table(name).collect()}
        assert first == {("insert", 0, 1), ("insert", 0, 2)}
        # commit more changes while the stream is live
        t.merge_upsert(spark.createDataFrame([(2, "b", 99)],
                                             "k int, grp string, v int"), "k")
        t.delete_where(F.col("k") == 1)
        q.processAllAvailable()
        rows = {(r["_change_type"], r["_commit_version"], r["k"], r["v"])
                for r in spark.table(name).collect()}
        assert ("update_preimage", 1, 2, 20) in rows
        assert ("update_postimage", 1, 2, 99) in rows
        assert ("delete", 2, 1, 10) in rows
        assert len(rows) == 5
    finally:
        q.stop()


def test_txlog_cdf_source_replay_between_offsets(spark, tmp_path):
    """readBetweenOffsets (failure replay) returns exactly the rows of
    the offset range, matching TxLogTable.read_changes."""
    from pyspark.sql import functions as F

    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        TxLogChangesDataSource,
    )

    d = str(tmp_path / "tbl")
    t = TxLogTable.create(
        spark, d,
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "k int, grp string, v int"),
        enable_cdf=True)
    t.merge_upsert(spark.createDataFrame([(2, "b", 99), (5, "e", 50)],
                                         "k int, grp string, v int"), "k")
    t.delete_where(F.col("k") == 1)
    ds = TxLogChangesDataSource({"path": d})
    reader = ds.simpleStreamReader(ds.schema())
    got = sorted(reader.readBetweenOffsets({"version": 1}, {"version": 2}))
    want = sorted(
        tuple(r) for r in t.read_changes(1, 1)
        .select("k", "grp", "v", "_change_type", "_commit_version").collect())
    assert got == want


# -- append-only table streaming source (format "txlogtable") ----------------

def test_table_stream_appends_and_optimize_transparent(spark, tmp_path):
    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        register_txlog_table_source)

    t = TxLogTable.create(
        spark, str(tmp_path / "ts"),
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
    t.optimize_compact(target_segments=1)  # must re-emit nothing
    register_txlog_table_source(spark)
    df = (spark.readStream.format("txlogtable")
          .option("path", t.path).load())
    q = (df.writeStream.format("memory").queryName("tbl_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tbl_stream").collect()
    got = sorted((r["k"], r["v"], r["_commit_version"]) for r in rows)
    assert got == [(1, 10, 0), (2, 20, 0), (3, 30, 1)]


def test_table_stream_raises_on_rewrite_unless_skipped(spark, tmp_path):
    from pyspark.sql import functions as F

    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        register_txlog_table_source)

    t = TxLogTable.create(
        spark, str(tmp_path / "tr"),
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.delete_where(F.col("k") == 1)  # rewrite commit
    t.append(spark.createDataFrame([(9, 90)], "k long, v long"))
    register_txlog_table_source(spark)
    # default: the rewrite poisons the append-only contract
    df = (spark.readStream.format("txlogtable")
          .option("path", t.path).load())
    q = (df.writeStream.format("memory").queryName("tbl_fail")
         .outputMode("append").trigger(availableNow=True).start())
    with pytest.raises(Exception, match="append-only|changes existing"):
        q.awaitTermination(120)
    # skipChangeCommits: rewrites ignored, appends still served
    df2 = (spark.readStream.format("txlogtable")
           .option("path", t.path)
           .option("skipchangecommits", "true").load())
    q2 = (df2.writeStream.format("memory").queryName("tbl_skip")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tbl_skip").collect()
    got = sorted((r["k"], r["v"], r["_commit_version"]) for r in rows)
    assert got == [(1, 10, 0), (2, 20, 0), (9, 90, 2)]


def test_table_stream_metadata_commits_transparent_and_rename_mapped(
        spark, tmp_path):
    """ADVICE r6: RENAME/DROP COLUMN (metadata-only) and CLONE commits
    must be transparent to the append-only table stream, and appends
    AFTER a rename store physical column names — the reader must serve
    them under the logical schema, not stream silent NULLs."""
    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        TxLogTableDataSource)

    t = TxLogTable.create(
        spark, str(tmp_path / "tm"),
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.rename_column("v", "val")              # metadata-only commit (v1)
    t.append(spark.createDataFrame([(3, 30)], "k long, val long"))  # v2
    clone = t.clone_to(str(tmp_path / "tm_clone"))

    ds = TxLogTableDataSource({"path": t.path})
    reader = ds.simpleStreamReader(ds.schema())
    assert [f.name for f in ds.schema().fields] == \
        ["k", "val", "_commit_version"]
    rows, end = reader.read({"version": 0})
    got = sorted(rows)
    # rename served no rows; post-rename append serves VALUES under the
    # logical name (the physical parquet column is still 'v')
    assert got == [(1, 10, 0), (2, 20, 0), (3, 30, 2)]
    assert end == {"version": 3}

    # a stream on the CLONE starting past its initial snapshot: the
    # CLONE commit itself is transparent (no re-emission of the source)
    clone.append(spark.createDataFrame([(7, 70)], "k long, val long"))
    ds2 = TxLogTableDataSource({"path": clone.path})
    reader2 = ds2.simpleStreamReader(ds2.schema())
    rows2, _ = reader2.read({"version": 0})
    assert sorted(rows2) == [(7, 70, 1)]


def test_table_stream_txn_commits(spark, tmp_path):
    """Append-only table stream over TXN commits: an all-append txn
    serves its rows; a txn containing a rewrite raises unless
    skipChangeCommits (which then serves only the append steps)."""
    from pyspark.sql import functions as F

    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        TxLogTableDataSource)

    t = TxLogTable.create(
        spark, str(tmp_path / "txs"),
        spark.createDataFrame([(1, 10)], "k long, v long"))
    t.begin_transaction()
    t.append(spark.createDataFrame([(2, 20)], "k long, v long"))
    t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
    t.commit_transaction()                                    # v1: all-append
    t.begin_transaction()
    t.append(spark.createDataFrame([(4, 40)], "k long, v long"))
    t.delete_where(F.col("k") == 1)
    t.commit_transaction()                                    # v2: mixed
    ds = TxLogTableDataSource({"path": t.path})
    reader = ds.simpleStreamReader(ds.schema())
    with pytest.raises(ValueError, match="changes existing rows"):
        reader.readBetweenOffsets({"version": 0}, {"version": 3})
    ds2 = TxLogTableDataSource({"path": t.path,
                                "skipchangecommits": "true"})
    reader2 = ds2.simpleStreamReader(ds2.schema())
    rows = sorted(reader2.readBetweenOffsets({"version": 0}, {"version": 3}))
    assert rows == [(1, 10, 0), (2, 20, 1), (3, 30, 1), (4, 40, 2)]


def test_cdf_stream_across_rename(spark, tmp_path):
    """ADVICE r7 (high): CDF sidecars are written from LOGICAL-named
    frames, so after RENAME COLUMN their rows carry the new logical name
    — the stream reader's latest-mapping lookup turned those into silent
    NULLs.  Per-version mapping must serve values for commits before,
    between, and after renames."""
    from pyspark.sql import functions as F

    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        TxLogChangesDataSource)

    t = TxLogTable.create(
        spark, str(tmp_path / "cdfren"),
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        enable_cdf=True)
    t.update_where({"v": F.lit(99)}, F.col("k") == 1)    # v1: cdf 'v'
    t.rename_column("v", "val")                          # v2: metadata
    t.update_where({"val": F.lit(77)}, F.col("k") == 2)  # v3: cdf 'val'
    t.append(spark.createDataFrame([(3, 30)],
                                   "k long, val long"))  # v4: physical 'v'
    t.rename_column("val", "value")                      # v5: metadata
    t.update_where({"value": F.lit(55)}, F.col("k") == 3)  # v6: cdf 'value'

    ds = TxLogChangesDataSource({"path": t.path})
    assert [f.name for f in ds.schema().fields] == \
        ["k", "value", "_change_type", "_commit_version"]
    reader = ds.simpleStreamReader(ds.schema())
    rows, end = reader.read({"version": 0})
    rows = list(rows)
    assert end == {"version": 7}
    assert all(r[1] is not None for r in rows), \
        f"renamed column streamed NULLs: {rows}"
    by = {(r[0], r[3], r[2]): r[1] for r in rows}
    assert by[(1, 1, "update_postimage")] == 99   # cdf written as 'v'
    assert by[(2, 3, "update_postimage")] == 77   # cdf written as 'val'
    assert by[(3, 4, "insert")] == 30             # segment, physical 'v'
    assert by[(3, 6, "update_postimage")] == 55   # cdf written as 'value'
    # replay determinism across the same offsets (failure recovery path)
    replay = list(reader.readBetweenOffsets({"version": 0}, {"version": 7}))
    assert sorted(replay) == sorted(rows)


def test_stream_max_versions_per_trigger(spark, tmp_path):
    """maxVersionsPerTrigger (Delta's maxFilesPerTrigger shape): a
    stream starting against a backlog drains it in bounded micro-batches
    — each read() advances at most N versions — and the batches
    concatenate to exactly the unbounded result."""
    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        TxLogChangesDataSource, TxLogTableDataSource)

    t = TxLogTable.create(
        spark, str(tmp_path / "rl"),
        spark.createDataFrame([(0, 0)], "k long, v long"), enable_cdf=True)
    for i in range(1, 6):
        t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
    # table source: 6 commits, 2 per trigger -> 3 batches
    ds = TxLogTableDataSource({"path": t.path, "maxversionspertrigger": "2"})
    reader = ds.simpleStreamReader(ds.schema())
    offsets, rows = [{"version": 0}], []
    while True:
        batch, end = reader.read(offsets[-1])
        batch = list(batch)
        if end == offsets[-1]:
            break
        assert end["version"] - offsets[-1]["version"] <= 2
        rows.extend(batch)
        offsets.append(end)
    assert len(offsets) - 1 == 3, f"expected 3 bounded batches: {offsets}"
    assert sorted(r[0] for r in rows) == [0, 1, 2, 3, 4, 5]
    # unbounded reader yields the same concatenation
    ds_all = TxLogTableDataSource({"path": t.path})
    all_rows = list(ds_all.simpleStreamReader(ds_all.schema())
                    .read({"version": 0})[0])
    assert sorted(all_rows) == sorted(rows)
    # CDF source honors the same option
    ds_cdf = TxLogChangesDataSource({"path": t.path,
                                     "maxversionspertrigger": "4"})
    r_cdf = ds_cdf.simpleStreamReader(ds_cdf.schema())
    b1, e1 = r_cdf.read({"version": 0})
    assert e1 == {"version": 4} and len(list(b1)) == 4
    b2, e2 = r_cdf.read(e1)
    assert e2 == {"version": 6} and len(list(b2)) == 2


def test_cdf_stream_starting_timestamp(spark, tmp_path):
    """Delta's startingTimestamp stream option: the CDF stream begins
    with the first commit at-or-after the given time (in-commit
    timestamps are monotonic); mutually exclusive with startversion."""
    import pytest as _pytest

    from distributed_database_for_sql_spark.sources.txlog import TxLogTable
    from distributed_database_for_sql_spark.sources.txlog_stream import (
        _resolve_start_version,
        register_txlog_cdf_source,
    )

    t = TxLogTable.create(
        spark, str(tmp_path / "ts"),
        spark.createDataFrame([(1, 10)], "k long, v long"),
        enable_cdf=True)
    t.append(spark.createDataFrame([(2, 20)], "k long, v long"))
    t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
    ts_v2 = t._commit_ts(2)
    register_txlog_cdf_source(spark)
    df = (spark.readStream.format("txlogcdf")
          .option("path", t.path)
          .option("startingtimestamp", str(ts_v2)).load())
    q = (df.writeStream.format("memory").queryName("cdf_ts")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["k"], r["_commit_version"]) for r in
                 spark.sql("SELECT * FROM cdf_ts").collect())
    assert got == [(3, 2)]
    # exclusivity + a time after every commit = empty stream start
    with _pytest.raises(ValueError, match="mutually exclusive"):
        _resolve_start_version({"path": t.path, "startversion": "0",
                                "startingtimestamp": str(ts_v2)})
    assert _resolve_start_version(
        {"path": t.path,
         "startingtimestamp": str(ts_v2 + 10_000)}) == 3
