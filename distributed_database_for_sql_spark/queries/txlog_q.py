"""ACID table-format queries over the native transaction-log tables
(sources/txlog.py — the Delta-style log protocol re-implemented on
parquet + JSON commits; SURVEY.md §1.3's durability twin of the
reference's replicated command log, /root/reference/src/raft/
replication.go:88-103).

Each query rebuilds its table from the driver's parquet deterministically
on every call, so the DuckDB oracle can recompute the exact expected state
from the raw ``orders`` table: a hash match proves the log replay, the
copy-on-write MERGE/DELETE, and the time-travel snapshot are value-exact —
not just that "a" table came back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources.txlog import TxLogTable
from .base import register


def _table_dir(tag: str, sf_dir: str) -> str:
    from ..tmpstage import staging_dir

    return staging_dir(f"txlog_{tag}", sf_dir)


_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"


def _build_merged_table(spark: SparkSession, sf_dir: str,
                        tag: str) -> TxLogTable:
    """v0 = orders keys <= 1000; v1 = MERGE of keys (500, 1500] with
    cents bumped by +7 — overlapping keys exercise the update arm,
    (1000, 1500] the insert arm, and keys <= 500 must survive untouched
    (their segments are never rewritten: copy-on-write file pruning)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    # 4 segments per write: enough files to make copy-on-write pruning
    # meaningful, few enough that commit metadata stays tiny at this SF.
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir(tag, sf_dir), base,
                          overwrite=True)
    t.merge_upsert(updates, "o_orderkey")
    return t


@register(
    "delta_merge_upsert",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), upd AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM upd
      UNION ALL
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           MIN(o_orderkey)            AS min_key,
           MAX(o_orderkey)            AS max_key
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "merge", "sink", "source"),
)
def delta_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) into a transaction-log table, then read the committed
    snapshot back through log replay.  The oracle recomputes the post-MERGE
    state relationally from raw orders; a hash match proves update-arm,
    insert-arm, AND untouched-segment carry-over are all value-exact.

    At 100 TB the MERGE rewrites only segments containing matched keys
    (semi-join file pruning on input_file_name) — cost ∝ touched data,
    the only affordable upsert shape on immutable storage."""
    t = _build_merged_table(spark, sf_dir, "merge")
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_delete_where",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                          AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT)     AS total_cents
    FROM orders
    WHERE o_orderkey <= 1000 AND o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "delete", "source"),
)
def delta_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE on the transaction-log table: rows matching
    the predicate disappear from the next snapshot, untouched segments
    carry over by reference, and the pre-delete snapshot stays readable
    (pytest covers that part; this query certifies the post-delete state
    value-exactly against relational recomputation)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("delete", sf_dir), base,
                          overwrite=True)
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_optimize_compact",
    # Compaction must be a pure LAYOUT change: the post-OPTIMIZE snapshot
    # hashes identically to the pre-OPTIMIZE data.  The audit column is a
    # BOOLEAN (fewer files after than before) rather than exact counts —
    # Spark may skip hash-empty partitions on write, so pinning 8/2 in
    # the oracle would flip red nondeterministically across data regens
    # (ADVICE r5); the exact 8→2 layout is pinned in tests/test_txlog.py
    # where the fixture rows are controlled.
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           TRUE                          AS compaction_reduced_files
    FROM orders
    WHERE o_orderkey <= 1000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "compaction", "layout"),
)
def delta_optimize_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style compaction: two 4-segment appends leave 8 small
    segments; compaction rewrites them into 2 — and the data must come
    back value-identical (the whole point: layout changed, rows didn't).
    The emitted audit flag comes from the commit log's own OPTIMIZE
    entry, so the hash also certifies the audit record (as a robust
    boolean; exact counts are pinned in pytest — see oracle comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    half1 = (orders.filter(F.col("o_orderkey") <= 500)
             .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
             .repartition(4, "o_orderkey"))
    half2 = (orders
             .filter((F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 1000))
             .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
             .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("compact", sf_dir), half1,
                          overwrite=True)
    t.append(half2)
    t.optimize_compact(target_segments=2)
    opt = t.history()[-1]
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("compaction_reduced_files",
                    F.lit(opt["filesRewritten"] > opt["filesAdded"]))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_time_travel",
    oracle=f"""
    WITH v0 AS (
      SELECT o_orderpriority, COUNT(*) AS n_v0,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents_v0
      FROM orders WHERE o_orderkey <= 1000
      GROUP BY o_orderpriority
    ), upd AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM upd
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
    ), v1 AS (
      SELECT o_orderpriority, COUNT(*) AS n_v1,
             CAST(SUM(cents) AS BIGINT) AS cents_v1
      FROM final GROUP BY o_orderpriority
    )
    SELECT v0.o_orderpriority, v0.n_v0, v0.cents_v0, v1.n_v1, v1.cents_v1
    FROM v0 JOIN v1 USING (o_orderpriority)
    ORDER BY v0.o_orderpriority
    """,
    tags=("acid", "delta", "time-travel", "source"),
)
def delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: after the MERGE commit, ``read(version=0)`` must return
    the exact pre-MERGE snapshot while the latest read sees the merged
    state — both verified value-exactly against relational recomputation.
    Snapshot isolation comes free from the log: old segments are never
    mutated, only de-listed by later commits."""
    t = _build_merged_table(spark, sf_dir, "travel")
    v0 = (t.read(version=0)
          .groupBy("o_orderpriority")
          .agg(F.count("*").alias("n_v0"), F.sum("cents").alias("cents_v0")))
    v1 = (t.read()
          .groupBy("o_orderpriority")
          .agg(F.count("*").alias("n_v1"), F.sum("cents").alias("cents_v1")))
    return (v0.join(v1, "o_orderpriority")
            .orderBy("o_orderpriority"))


@register(
    "delta_v2_checkpoint",
    # Oracle: relational recompute of the final state (base + three
    # appends, minus the modulo delete); the audit flags certify the
    # mechanism — the fresh handle resolved FROM the v2 checkpoint
    # (read-call bound ≤ interval+1, counted on a monkeypatched commit
    # reader), sidecar files exist on disk, BOTH spec-allowed top
    # manifest encodings (.v2.json from the first era, .v2.parquet
    # after the property flip) landed on disk, and the protocol
    # carries the v2Checkpoint reader feature.  The value hash then
    # certifies the sidecar-held add list reproduced the exact
    # snapshot — resolved through the PARQUET top, the newest.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE (o_orderkey <= 1100 AND o_orderkey % 10 <> 0)
         OR (o_orderkey > 1100 AND o_orderkey <= 1500)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS resolved_from_v2_checkpoint,
           1 AS sidecars_on_disk,
           1 AS both_top_formats_on_disk,
           1 AS reader_feature_fenced
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "checkpoint", "v2", "protocol"),
)
def delta_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta 3.x V2 checkpoints end-to-end (r12): the table upgrades to
    the ``v2Checkpoint`` reader feature in one commit, subsequent
    checkpoints land as a metadata-sized top manifest + parquet
    SIDECAR files holding the add list (the only part that scales with
    file count — at 100 TB the top manifest stays O(1) and sidecar
    reads parallelize), and a fresh handle resolves the snapshot from
    manifest + sidecars with the same O(interval) read-call bound as
    the classic formats.  Commits cross a checkpoint boundary (append,
    DELETE, append) so the sidecars must carry removes' effects and
    per-file stats forward exactly.  r13: the scenario also flips
    ``txlog.checkpoint.v2Top`` to ``parquet`` mid-table — the spec's
    alternative top-manifest encoding — so the final resolution goes
    through a PARQUET top while an earlier JSON top is still on disk,
    certifying both encodings interoperate."""
    import glob as _glob
    import os as _os

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 800)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("v2ckpt", sf_dir), base,
                          overwrite=True)
    t.checkpoint_interval = 3
    t.enable_v2_checkpoints(part_size=2)                        # v1
    t.append(orders.filter((k > 800) & (k <= 1100))
             .select("o_orderkey", "o_orderpriority",
                     cents.alias("cents")))                      # v2
    t.delete_where(k % 10 == 0)                                  # v3 ckpt
    t.append(orders.filter((k > 1100) & (k <= 1300))
             .select("o_orderkey", "o_orderpriority",
                     cents.alias("cents")))                      # v4
    t.set_properties({"txlog.checkpoint.v2Top": "parquet"})      # v5
    t.append(orders.filter((k > 1300) & (k <= 1500))
             .select("o_orderkey", "o_orderpriority",
                     cents.alias("cents")))                      # v6 ckpt
    fresh = TxLogTable(spark, t.path)
    fresh.checkpoint_interval = 3
    reads: list[int] = []
    orig = fresh._read_commit
    fresh._read_commit = lambda v: (reads.append(v) or orig(v))
    out = (fresh.read()
           .groupBy("o_orderpriority")
           .agg(F.count("*").alias("n_rows"),
                F.sum("cents").alias("total_cents")))
    n = out.count()  # force resolution through the counting reader
    assert n > 0
    bounded = len({v for v in reads
                   if v <= fresh.latest_version()}) <= 3 + 1
    sidecars = _glob.glob(_os.path.join(t.path, "_txlog", "_sidecars",
                                        "*.parquet"))
    json_tops = _glob.glob(_os.path.join(t.path, "_txlog",
                                         "*.checkpoint.v2.json"))
    pq_tops = _glob.glob(_os.path.join(t.path, "_txlog",
                                       "*.checkpoint.v2.parquet"))
    fenced = "v2Checkpoint" in t.protocol().get("readerFeatures", [])
    return (out
            .withColumn("resolved_from_v2_checkpoint",
                        F.lit(bool(bounded and pq_tops)).cast("int"))
            .withColumn("sidecars_on_disk",
                        F.lit(bool(sidecars)).cast("int"))
            .withColumn("both_top_formats_on_disk",
                        F.lit(bool(json_tops and pq_tops)).cast("int"))
            .withColumn("reader_feature_fenced",
                        F.lit(fenced).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_uniform_iceberg_export",
    # Oracle: relational recompute of the final snapshot (base + append,
    # minus the modulo delete).  The SPARK side computes its aggregate
    # by reading the table through the GENERATED ICEBERG METADATA ONLY
    # (version-hint -> metadata.json -> manifest list -> manifests ->
    # parquet), never the txlog — so the value hash certifies the
    # export names exactly the right files.  Audit flags pin the
    # mechanism: planned paths == txlog active paths, planned record
    # counts == snapshot row count, at least one manifest was REUSED
    # across refreshes (the O(changed files) scale property), and one
    # Iceberg snapshot exists per export.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey <= 1200 AND o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS paths_match_snapshot,
           1 AS record_counts_match,
           1 AS manifest_reused,
           3 AS snapshots_tracked
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "iceberg", "uniform", "interop"),
)
def delta_uniform_iceberg_export(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """UniForm-shape Iceberg metadata export (r13): after each commit
    the table exports an Iceberg v2 metadata tree (metadata.json +
    manifest-list + manifests under <table>/metadata/) over the SAME
    parquet files — zero data copies — and an Iceberg-side planner
    reads the snapshot back without ever touching ``_txlog/``.
    Manifest REUSE keeps each refresh O(changed files): the append's
    refresh must carry the base manifest forward untouched.  At 100 TB
    this is the interop path that lets Trino/Flink/Snowflake-class
    engines plan the table from metadata-sized reads while Spark keeps
    writing through the ACID log.  (sources/uniform.py; churn pin in
    tests/test_txlog.py::test_uniform_iceberg_export_churn.)"""
    from ..sources import uniform

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 900)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("uniform", sf_dir), base,
                          overwrite=True)
    t.generate_iceberg_metadata()                               # snap 0
    t.append(orders.filter((k > 900) & (k <= 1200))
             .select("o_orderkey", "o_orderpriority",
                     cents.alias("cents")))                     # v1
    t.generate_iceberg_metadata()                               # snap 1
    t.delete_where(k % 7 == 0)                                  # v2 (CoW)
    t.generate_iceberg_metadata()                               # snap 2
    # ---- Iceberg-side audit: plan via the exported metadata only ----
    files = uniform.plan_files(t.path)
    planned_paths = sorted(f["file_path"] for f in files)
    import os as _os
    live, _ = t._snapshot_files()
    active_paths = sorted(_os.path.abspath(p) for p in live)
    planned_records = sum(f["record_count"] for f in files)
    meta = uniform.current_metadata(t.path)
    snap1_entries = uniform._read_manifest_list(
        next(s for s in meta["snapshots"] if s["snapshot-id"] == 1)
        ["manifest-list"])
    reused = any(e["existing_files_count"] > 0
                 and e["added_files_count"] == 0 for e in snap1_entries)
    # ---- the data itself flows through the Iceberg metadata path ----
    out = (uniform.read_snapshot(spark, t.path)
           .groupBy("o_orderpriority")
           .agg(F.count("*").alias("n_rows"),
                F.sum("cents").alias("total_cents")))
    return (out
            .withColumn("paths_match_snapshot",
                        F.lit(planned_paths == active_paths).cast("int"))
            .withColumn("record_counts_match",
                        F.lit(planned_records == t.read().count())
                        .cast("int"))
            .withColumn("manifest_reused", F.lit(reused).cast("int"))
            .withColumn("snapshots_tracked",
                        F.lit(len(meta["snapshots"])).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_uniform_position_deletes",
    # Oracle: relational recompute of the merge-on-read state — base
    # minus the DV-tombstoned rows, plus the append.  The SPARK side
    # computes its aggregate by reading THROUGH the exported Iceberg
    # metadata at the MoR snapshot (data manifests + content=1 position-
    # delete manifests, applied via the file+position anti-join), never
    # the txlog — so the value hash certifies the delete files tombstone
    # exactly the right (file, row) pairs.  Audit flags pin the
    # mechanism: the delete manifest exists and its row count equals the
    # DV'd row count, an APPEND refresh reuses BOTH the data manifests
    # and the delete file untouched, and a REORG PURGE retires the
    # delete manifest on the next refresh without changing the rows.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE (o_orderkey <= 1200 AND o_orderkey % 5 <> 0)
         OR (o_orderkey > 1200 AND o_orderkey <= 1500)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS delete_manifest_present,
           1 AS deletes_match_dv_rows,
           1 AS delete_entry_reused,
           1 AS data_manifest_reused,
           1 AS purge_retires_deletes,
           1 AS post_purge_rows_stable
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "iceberg", "uniform", "dv", "interop"),
)
def delta_uniform_position_deletes(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Iceberg v2 POSITION DELETES from deletion vectors (r14 — VERDICT
    r13 item 7): a DV'd (merge-on-read) snapshot exports content=1
    delete manifests over real parquet delete files (file_path/pos,
    the spec's schema and field-ids) instead of refusing, so Iceberg-
    side readers keep planning the table while tombstones accumulate —
    no forced REORG PURGE.  ``read_snapshot`` applies them the way an
    Iceberg MoR reader does: broadcast anti-join on (file, position)
    served by the scanner's ``_metadata.row_index``.  The delete file
    is REUSED across refreshes while the DV set is unchanged (same
    O(changed files) economics as data-manifest reuse), and a PURGE
    retires it automatically.  (sources/uniform.py
    ``_write_position_deletes``/``plan_deletes``; pin in
    tests/test_txlog.py::test_uniform_position_deletes_for_dv_snapshots.)"""
    from ..sources import uniform

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    sel = lambda flt: (orders.filter(flt)  # noqa: E731
                       .select("o_orderkey", "o_orderpriority",
                               cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("posdel", sf_dir),
                          sel(k <= 1200).repartition(4, "o_orderkey"),
                          overwrite=True)
    t.generate_iceberg_metadata()                          # snap 0
    n_tombstoned = sel((k <= 1200) & (k % 5 == 0)).count()
    t.delete_where(k % 5 == 0, use_dv=True)                # v1 (MoR)
    t.generate_iceberg_metadata()                          # snap 1
    dels1 = uniform.plan_deletes(t.path)
    t.append(sel((k > 1200) & (k <= 1500))
             .repartition(2, "o_orderkey"))                # v2
    t.generate_iceberg_metadata()                          # snap 2
    dels2 = uniform.plan_deletes(t.path)
    present = bool(dels1) and all(d["content"] == 1 for d in dels1)
    match_dv = sum(d["record_count"] for d in dels1) == n_tombstoned
    del_reused = bool(dels2) and sorted(
        d["file_path"] for d in dels2) == sorted(
        d["file_path"] for d in dels1)
    meta = uniform.current_metadata(t.path)
    snap2_entries = uniform._read_manifest_list(
        next(s for s in meta["snapshots"] if s["snapshot-id"] == 2)
        ["manifest-list"])
    data_reused = any(e.get("content", 0) == 0
                      and e["existing_files_count"] > 0
                      and e["added_files_count"] == 0
                      for e in snap2_entries)
    # ---- the MoR data itself flows through the Iceberg metadata path
    out = (uniform.read_snapshot(spark, t.path, snapshot_id=2)
           .groupBy("o_orderpriority")
           .agg(F.count("*").alias("n_rows"),
                F.sum("cents").alias("total_cents")))
    mor_rows = uniform.read_snapshot(spark, t.path, snapshot_id=2).count()
    t.reorg_purge()                                        # v3 (CoW)
    t.generate_iceberg_metadata()                          # snap 3
    purged = uniform.plan_deletes(t.path) == []
    stable = uniform.read_snapshot(spark, t.path).count() == mor_rows
    return (out
            .withColumn("delete_manifest_present",
                        F.lit(present).cast("int"))
            .withColumn("deletes_match_dv_rows",
                        F.lit(match_dv).cast("int"))
            .withColumn("delete_entry_reused",
                        F.lit(del_reused).cast("int"))
            .withColumn("data_manifest_reused",
                        F.lit(data_reused).cast("int"))
            .withColumn("purge_retires_deletes",
                        F.lit(purged).cast("int"))
            .withColumn("post_purge_rows_stable",
                        F.lit(stable).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_uniform_snapshot_audit",
    # Oracle: the snapshot ledger recomputed relationally — each
    # exported snapshot's ordinal, operation, physical record count and
    # position-delete count derive from the SAME orders predicate the
    # scenario committed, so a value hash certifies SHOW ICEBERG
    # SNAPSHOTS reports the true summary counters (physical rows stay
    # constant under a MoR delete, tombstones ride their own counter,
    # the purge folds them, expiry trims the ledger to the floor).
    oracle="""
    WITH counts AS (
      SELECT COUNT(*) FILTER (WHERE o_orderkey <= 1600) AS c1,
             COUNT(*) FILTER (WHERE o_orderkey <= 1600
                              AND o_orderkey % 4 = 0)   AS dels
      FROM orders
    )
    SELECT * FROM (
      SELECT 1 AS ordinal, 'overwrite' AS operation,
             c1 AS total_records, 0 AS total_position_deletes,
             0 AS delete_manifests, 0 AS is_current FROM counts
      UNION ALL
      SELECT 2, 'overwrite', c1, dels, 1, 0 FROM counts
      UNION ALL
      SELECT 3, 'overwrite', c1 - dels, 0, 0, 1 FROM counts
    ) ORDER BY ordinal
    """,
    tags=("acid", "delta", "iceberg", "uniform", "sql", "maintenance"),
)
def delta_uniform_snapshot_audit(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SHOW ICEBERG SNAPSHOTS (r14): the operator's metadata-only view
    of the UniForm export — one row per exported snapshot with its
    summary counters (Iceberg's ``snapshots`` metadata table), served
    through the SQL surface.  The scenario drives the full merge-on-
    read lifecycle under per-commit refresh (enable_uniform): append,
    DV delete (physical records UNCHANGED, tombstones counted
    separately — Iceberg MoR summary semantics), REORG PURGE (folds
    the tombstones into the physical count), then EXPIRE SNAPSHOTS
    trims the ledger to the newest 3.  Ordinals substitute for
    snapshot ids in the result so the hash pins the LEDGER SHAPE, not
    wall-clock ids.  (uniform.snapshots_df; SQL route in engine.py.)"""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    sel = lambda flt: (orders.filter(flt)  # noqa: E731
                       .select("o_orderkey", "o_orderpriority"))
    t = TxLogTable.create(spark, _table_dir("snapaudit", sf_dir),
                          sel(k <= 800).repartition(2, "o_orderkey"),
                          overwrite=True)                  # v0
    t.enable_uniform()                                     # v1 + snap 1
    t.append(sel((k > 800) & (k <= 1600))
             .repartition(2, "o_orderkey"))                # v2 + snap 2
    t.delete_where(k % 4 == 0, use_dv=True)                # v3 + snap 3
    t.reorg_purge()                                        # v4 + snap 4
    engine.register_txlog("audit_t", t)
    engine.sql("EXPIRE SNAPSHOTS FOR TABLE audit_t KEEP LAST 3")
    shown = engine.sql("SHOW ICEBERG SNAPSHOTS FOR TABLE audit_t")
    from pyspark.sql.window import Window
    ordinal = F.row_number().over(Window.orderBy("sequence_number"))
    return (shown
            .select(ordinal.alias("ordinal"), "operation",
                    "total_records", "total_position_deletes",
                    "delete_manifests", "is_current")
            .orderBy("ordinal"))


@register(
    "delta_domain_metadata",
    # Oracle: relational recompute of the final data state; the audit
    # flags certify the domain-metadata mechanics — config round-trip,
    # checkpointed replay through a FRESH handle, last-write-wins
    # update, removal tombstone, writer-only protocol fencing, and
    # time travel seeing the pre-removal map.  The value hash then
    # proves the metadata commits never perturbed the data.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1400
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS roundtrip_ok,
           1 AS checkpoint_replay_ok,
           1 AS removal_hidden,
           1 AS writer_only_fence,
           1 AS time_travel_sees_history
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "protocol", "metadata", "domain"),
)
def delta_domain_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DOMAIN METADATA (r14 — the ``domainMetadata`` writer
    feature): named, system-owned configuration blobs that ride the
    transaction LOG, not the schema — real Delta's mechanism for
    clustering state, row-tracking watermarks, and MV bookkeeping.
    One metadata-only commit per update; the domain map is CHECKPOINTED
    and replayed like txn watermarks (O(interval) reads on a
    million-commit table); removal is a tombstone; concurrent commits
    to the SAME domain conflict through OCC while different domains
    commute; the feature lists writer-only (readers stay unfenced).
    (txlog.py set_domain_metadata/_domain_state; OCC pin in
    tests/test_txlog.py::test_domain_metadata_roundtrip_checkpoint_and_occ.)"""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    sel = lambda flt: (orders.filter(flt)  # noqa: E731
                       .select("o_orderkey", "o_orderpriority",
                               cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("domain", sf_dir),
                          sel(k <= 1000).repartition(4, "o_orderkey"),
                          overwrite=True)
    t.checkpoint_interval = 2
    t.set_domain_metadata("pipeline.watermark", {"epoch": 1})     # v1
    t.append(sel((k > 1000) & (k <= 1400))
             .repartition(2, "o_orderkey"))                       # v2+ckpt
    t.set_domain_metadata("pipeline.watermark", {"epoch": 2})     # v3
    t.set_domain_metadata("clustering.state",
                          {"cols": ["o_orderkey"]})               # v4+ckpt
    t.remove_domain_metadata("clustering.state")                  # v5
    fresh = TxLogTable(spark, t.path)
    roundtrip = fresh.domain_metadata("pipeline.watermark") == {"epoch": 2}
    ckpt = fresh._best_checkpoint(fresh.latest_version())
    replay_ok = ckpt is not None and "domains" in ckpt and \
        fresh.domain_metadata() == {"pipeline.watermark": {"epoch": 2}}
    removed = fresh.domain_metadata("clustering.state") is None
    proto = fresh.protocol()
    fence = "domainMetadata" in proto.get("writerFeatures", []) and \
        "domainMetadata" not in proto.get("readerFeatures", [])
    history = fresh.domain_metadata("clustering.state", version=4) == \
        {"cols": ["o_orderkey"]}
    return (fresh.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("roundtrip_ok", F.lit(roundtrip).cast("int"))
            .withColumn("checkpoint_replay_ok",
                        F.lit(replay_ok).cast("int"))
            .withColumn("removal_hidden", F.lit(removed).cast("int"))
            .withColumn("writer_only_fence", F.lit(fence).cast("int"))
            .withColumn("time_travel_sees_history",
                        F.lit(history).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_version_checksum",
    # Oracle: relational recompute of the final state after the full
    # CoW + MoR + purge churn; audit flags certify the checksum
    # mechanics — a crc per commit, validate_checksum green at EVERY
    # version of the chain, the incremental chain equal to a full
    # recompute at head, DV targets counted while outstanding, and a
    # tampered crc detected with a field-named error.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey <= 1300 AND o_orderkey % 6 <> 0
        AND o_orderkey % 11 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS crc_per_commit,
           1 AS validate_all_versions,
           1 AS incremental_matches_full,
           1 AS dv_targets_counted,
           1 AS tamper_detected
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "checksum", "integrity", "maintenance"),
)
def delta_version_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style VERSION CHECKSUMS (r14 — the ``<v>.crc`` state file):
    with ``txlog.checksum.enabled`` every commit writes a state summary
    (file count, table bytes, DV'd targets, schema hash, protocol) that
    any reader can verify its snapshot reconstruction against — a torn
    replay or lost file becomes a loud, field-named error instead of a
    silently wrong read.  INCREMENTAL: each crc advances the previous
    one by the commit's own actions (O(changed files) stat calls, never
    O(table) — the property that keeps the hook viable on a 100k-file
    table); checkpoint versions resync from the manifest's exact state,
    bounding drift; log cleanup expires crc files with their commits.
    (txlog.py _maybe_crc/validate_checksum; chain/tamper/cleanup pin in
    tests/test_txlog.py::test_version_checksum_chain_validate_and_cleanup.)"""
    import os as _os

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    sel = lambda flt: (orders.filter(flt)  # noqa: E731
                       .select("o_orderkey", "o_orderpriority",
                               cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("crc", sf_dir),
                          sel(k <= 900).repartition(4, "o_orderkey"),
                          overwrite=True)
    t.checkpoint_interval = 3
    t.enable_checksums()                                          # v1
    t.append(sel((k > 900) & (k <= 1300))
             .repartition(2, "o_orderkey"))                      # v2
    t.delete_where(k % 6 == 0)                                    # v3+ckpt
    t.delete_where(k % 11 == 0, use_dv=True)                      # v4 (MoR)
    dv_counted = t._read_crc(4) is not None and \
        t._read_crc(4)["numDvFiles"] >= 1
    t.reorg_purge()                                               # v5
    latest = t.latest_version()
    per_commit = all(
        _os.path.exists(t._crc_path(v)) for v in range(1, latest + 1))
    try:
        validate_all = all(
            t.validate_checksum(v)["version"] == v
            for v in range(1, latest + 1))
    except (ValueError, FileNotFoundError):
        validate_all = False
    incr_full = t._read_crc(latest) == t._crc_state(latest)
    import json as _json
    doctored = dict(t._read_crc(latest), tableSizeBytes=1)
    with open(t._crc_path(latest), "w") as f:
        _json.dump(doctored, f)
    try:
        t.validate_checksum(latest)
        tamper = False
    except ValueError as e:
        tamper = "tableSizeBytes" in str(e)
    with open(t._crc_path(latest), "w") as f:
        _json.dump(t._crc_state(latest), f)
    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("crc_per_commit", F.lit(per_commit).cast("int"))
            .withColumn("validate_all_versions",
                        F.lit(validate_all).cast("int"))
            .withColumn("incremental_matches_full",
                        F.lit(incr_full).cast("int"))
            .withColumn("dv_targets_counted",
                        F.lit(dv_counted).cast("int"))
            .withColumn("tamper_detected", F.lit(tamper).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_uniform_metadata_tables",
    # Oracle: relational recompute of the MoR snapshot an Iceberg
    # reader plans from SHOW ICEBERG FILES; the audit flags certify
    # the two metadata tables — the files table's data rows equal to
    # the physical file count and PRE-delete record total, the
    # content=1 delete row carrying exactly the tombstone count, the
    # manifests table consistent with the files table (entry counts
    # sum to the planned file count, the delete manifest tracked
    # separately), and the AT SNAPSHOT form showing the pre-DV
    # snapshot clean of delete files.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey <= 1200 AND o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS files_match_physical,
           1 AS delete_file_counted,
           1 AS manifests_consistent,
           1 AS historical_snapshot_clean
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "iceberg", "uniform", "sql", "metadata"),
)
def delta_uniform_metadata_tables(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Iceberg ``files`` / ``manifests`` METADATA TABLES over the
    UniForm export (r14 — completes the metadata-table trio with
    r14's SHOW ICEBERG SNAPSHOTS): ``SHOW ICEBERG FILES FOR TABLE t
    [AT SNAPSHOT n]`` is the per-file scan plan (content kind, path,
    partition tuple, record count, bytes — planned exactly like an
    Iceberg engine, data files never opened) and ``SHOW ICEBERG
    MANIFESTS`` is manifest-list health (entry counts, lineage,
    compaction pressure) reading ONLY the manifest list.  At 100 TB
    both answer from metadata-sized reads.  (uniform.files_df /
    manifests_df; SQL routes in engine.py; pin in
    tests/test_txlog.py::test_uniform_files_and_manifests_tables.)"""
    from ..engine import Engine
    from ..sources import uniform

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    sel = lambda flt: (orders.filter(flt)  # noqa: E731
                       .select("o_orderkey", "o_orderpriority",
                               cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("icemeta", sf_dir),
                          sel(k <= 1200).repartition(4, "o_orderkey"),
                          overwrite=True)
    n_physical = sel(k <= 1200).count()
    n_tomb = sel((k <= 1200) & (k % 7 == 0)).count()
    t.generate_iceberg_metadata()                          # snap 0
    t.delete_where(k % 7 == 0, use_dv=True)                # v1 (MoR)
    t.generate_iceberg_metadata()                          # snap 1
    engine.register_txlog("icemeta_t", t)
    files = engine.sql("SHOW ICEBERG FILES FOR TABLE icemeta_t").collect()
    data_rows = [r for r in files if r["content"] == 0]
    del_rows = [r for r in files if r["content"] == 1]
    files_ok = (len(data_rows) == 4
                and sum(r["record_count"] for r in data_rows) == n_physical)
    del_ok = (len(del_rows) == 1
              and del_rows[0]["record_count"] == n_tomb
              and del_rows[0]["file_format"] == "PARQUET")
    mans = engine.sql(
        "SHOW ICEBERG MANIFESTS FOR TABLE icemeta_t").collect()
    data_mans = [r for r in mans if r["content"] == 0]
    del_mans = [r for r in mans if r["content"] == 1]
    man_ok = (
        sum(r["added_files_count"] + r["existing_files_count"]
            for r in data_mans) == len(data_rows)
        and len(del_mans) == 1
        and del_mans[0]["added_rows_count"] == n_tomb)
    hist = engine.sql(
        "SHOW ICEBERG FILES FOR TABLE icemeta_t AT SNAPSHOT 0").collect()
    hist_ok = (all(r["content"] == 0 for r in hist)
               and sum(r["record_count"] for r in hist) == n_physical)
    return (uniform.read_snapshot(spark, t.path)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("files_match_physical",
                        F.lit(files_ok).cast("int"))
            .withColumn("delete_file_counted", F.lit(del_ok).cast("int"))
            .withColumn("manifests_consistent",
                        F.lit(man_ok).cast("int"))
            .withColumn("historical_snapshot_clean",
                        F.lit(hist_ok).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_uniform_tags",
    # Oracle: relational recompute of the TAGGED snapshot — the exact
    # dataset the tag pinned, re-read through the Iceberg metadata
    # path after two refreshes and an expiry pass that collected
    # everything unpinned.  Audit flags certify the ref mechanics:
    # the tag survives refreshes, expiry retains BOTH tagged
    # snapshots despite keep_last=1, dropping a tag releases its
    # snapshot to the next expiry, and "main" tracks the head.
    oracle=f"""
    WITH tagged AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS tag_survives_refresh,
           1 AS tag_protects_expiry,
           1 AS drop_releases_snapshot,
           1 AS main_tracks_head
    FROM tagged
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "iceberg", "uniform", "sql", "versioning"),
)
def delta_uniform_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg TAGS over the UniForm export (r14 — the ``refs`` map):
    dataset versioning for reproducible reads.  A training run tags
    the snapshot it consumed (``CREATE ICEBERG TAG``) and re-reads
    EXACTLY those files later regardless of table churn:
    ``expire_snapshots`` never removes a tagged snapshot, VACUUM's
    protection set covers every retained snapshot's files, and the
    tag rides metadata.json through every refresh.  Dropping the tag
    releases the snapshot to normal expiry.  All metadata-only — at
    100 TB a tag costs one metadata.json rewrite, never a data copy
    (contrast with CLONE, which is the right tool when independent
    WRITES are needed).  (uniform.create_tag/drop_tag/resolve_ref/
    refs_df; SQL routes in engine.py; pin in
    tests/test_txlog.py::test_uniform_tags_pin_snapshots.)"""
    from ..engine import Engine
    from ..sources import uniform

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    sel = lambda flt: (orders.filter(flt)  # noqa: E731
                       .select("o_orderkey", "o_orderpriority",
                               cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("icetag", sf_dir),
                          sel(k <= 1000).repartition(3, "o_orderkey"),
                          overwrite=True)
    t.generate_iceberg_metadata()                          # snap 0
    engine.register_txlog("icetag_t", t)
    engine.sql("CREATE ICEBERG TAG training_v1 FOR TABLE icetag_t")
    t.delete_where(k % 3 == 0, use_dv=True)                # v1 (MoR)
    t.generate_iceberg_metadata()                          # snap 1
    uniform.create_tag(t.path, "tmp", snapshot_id=1)
    t.append(sel((k > 1000) & (k <= 1400))
             .repartition(2, "o_orderkey"))                # v2
    t.generate_iceberg_metadata()                          # snap 2
    survives = uniform.resolve_ref(t.path, "training_v1") == 0
    uniform.expire_snapshots(t.path, keep_last=1)
    snaps = {s["snapshot-id"]
             for s in uniform.current_metadata(t.path)["snapshots"]}
    protects = snaps == {0, 1, 2}  # both tags pinned past keep_last=1
    engine.sql("DROP ICEBERG TAG tmp FOR TABLE icetag_t")
    uniform.expire_snapshots(t.path, keep_last=1)
    snaps = {s["snapshot-id"]
             for s in uniform.current_metadata(t.path)["snapshots"]}
    releases = snaps == {0, 2}  # tmp's snapshot collected, tag kept
    head = uniform.resolve_ref(t.path, "main") == 2
    return (uniform.read_snapshot(spark, t.path, ref="training_v1")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("tag_survives_refresh",
                        F.lit(survives).cast("int"))
            .withColumn("tag_protects_expiry",
                        F.lit(protects).cast("int"))
            .withColumn("drop_releases_snapshot",
                        F.lit(releases).cast("int"))
            .withColumn("main_tracks_head", F.lit(head).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_row_level_concurrency",
    # Oracle: relational recompute of the final state after four
    # concurrent-writer races on ONE shared data file; the audit flags
    # certify the row-level OCC rules — disjoint DV updates on the
    # same file COMMUTE (both post-image sets land), overlapping
    # update x update CONFLICTS (the loser raises instead of
    # duplicating the row), update x delete conflicts in BOTH
    # directions (no resurrected rows, no lost deletes), and
    # delete x delete commutes even on overlap (tombstone unions are
    # idempotent).  The value hash then proves the commuting commits
    # composed to exactly the serial result.
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1200
    ), final AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 10 = 1 THEN cents + 7
                  WHEN o_orderkey % 10 = 2 THEN cents + 11
                  WHEN o_orderkey % 10 = 3 THEN cents * 2
                  ELSE cents END AS cents
      FROM base
      WHERE o_orderkey % 10 NOT IN (4, 5)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS disjoint_updates_commute,
           1 AS update_update_conflicts,
           1 AS update_delete_conflicts,
           1 AS delete_delete_commutes
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "occ", "dv", "concurrency"),
)
def delta_row_level_concurrency(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """ROW-LEVEL CONCURRENCY for merge-on-read commits (r14 — Delta's
    DV conflict-resolution granularity): two concurrent DV commits
    tombstoning the SAME data file commute when their (file, row) sets
    are DISJOINT, and conflict at ROW granularity otherwise — without
    this, a concurrent DV UPDATE pair touching one row would both
    commit and duplicate it with conflicting post-images (the base
    file stays active, so file-level OCC never fires).  The
    intersection check runs only on the OCC retry path, only over
    SHARED target files, and reads only the two commits' DV sidecars —
    O(tombstones on contended files), never O(table).  The scenario
    packs the table into ONE file (maximum contention) and races four
    writer pairs through a mid-commit hook: disjoint updates, an
    overlapping update pair, update-vs-delete, and an overlapping
    delete pair.  (txlog.py _check_dv_row_conflicts/_dv_rows; pin in
    tests/test_txlog.py::test_dv_row_level_concurrency.)"""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    t = TxLogTable.create(
        spark, _table_dir("rowocc", sf_dir),
        orders.filter(k <= 1200)
        .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
        .repartition(1),
        overwrite=True)
    orig = t._write_dv
    m10 = F.col("o_orderkey") % 10

    def racing(fn):
        def race(dv_df):
            rel = orig(dv_df)
            fn(TxLogTable(spark, t.path))
            return rel
        return race

    # race 1 — disjoint rows, one shared file: both updates commit
    t._write_dv = racing(
        lambda r: r.update_where({"cents": "cents + 11"}, m10 == 2,
                                 use_dv=True))
    t.update_where({"cents": "cents + 7"}, m10 == 1, use_dv=True)
    commuted = t.latest_version() == 2

    # race 2 — overlapping update x update: loser raises, winner stands
    t._write_dv = racing(
        lambda r: r.update_where({"cents": "cents * 2"}, m10 == 3,
                                 use_dv=True))
    try:
        t.update_where({"cents": "cents + 1"}, m10 == 3, use_dv=True)
        uu_conflict = False
    except RuntimeError as e:
        uu_conflict = "tombstoned row" in str(e)

    # race 3 — update racing a concurrent DELETE of the same rows:
    # conflict (the update would resurrect them)
    t._write_dv = racing(
        lambda r: r.delete_where(m10 == 4, use_dv=True))
    try:
        t.update_where({"cents": "cents + 1"}, m10 == 4, use_dv=True)
        ud_conflict = False
    except RuntimeError as e:
        ud_conflict = "DELETE" in str(e) and "tombstoned row" in str(e)

    # race 4 — overlapping delete x delete: tombstone unions are
    # idempotent, both commit, the rows go exactly once
    t._write_dv = racing(
        lambda r: r.delete_where(m10 == 5, use_dv=True))
    t.delete_where(m10 == 5, use_dv=True)
    t._write_dv = orig
    dd_commuted = t.latest_version() == 6

    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("disjoint_updates_commute",
                        F.lit(commuted).cast("int"))
            .withColumn("update_update_conflicts",
                        F.lit(uu_conflict).cast("int"))
            .withColumn("update_delete_conflicts",
                        F.lit(ud_conflict).cast("int"))
            .withColumn("delete_delete_commutes",
                        F.lit(dd_commuted).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "delta_log_retention",
    # Oracle: relational recompute of the retained snapshot; the audit
    # flags certify the cleanup mechanics — a positive retention floor,
    # pre-floor time travel refused with a CLEAR error, history
    # confined to the retained range, and commits/checkpoints below
    # the floor actually gone from disk.  The value hash then proves
    # the truncated log still resolves the exact state.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE (o_orderkey <= 900 AND o_orderkey % 9 <> 0)
         OR (o_orderkey > 900 AND o_orderkey <= 1100)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1 AS floor_positive,
           1 AS pre_floor_refused,
           1 AS history_starts_at_floor,
           1 AS old_log_files_gone
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "checkpoint", "retention", "maintenance"),
)
def delta_log_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata cleanup / log retention (r12 —
    ``delta.logRetentionDuration``): the transaction log itself is
    bounded, not just the data files.  Commits and checkpoint
    manifests strictly below the newest aged-past-retention checkpoint
    are deleted; retained versions keep resolving checkpoint-first
    with the same read-call bound (at 100 TB a streaming table commits
    millions of times — without this the log directory grows forever);
    versions below the floor refuse loudly instead of serving a torn
    replay.  The scenario drives appends + a DELETE across checkpoint
    boundaries, cleans with zero retention, and reads back through a
    fresh handle."""
    import glob as _glob
    import os as _os

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    rows = lambda flt: (orders.filter(flt)  # noqa: E731
                        .select("o_orderkey", "o_orderpriority",
                                cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("logret", sf_dir),
                          rows(k <= 300), overwrite=True)
    t.checkpoint_interval = 3
    t.set_properties({"delta.enableExpiredLogCleanup": "false"})
    t.append(rows((k > 300) & (k <= 600)))
    t.append(rows((k > 600) & (k <= 900)))
    t.delete_where(k % 9 == 0)
    t.append(rows((k > 900) & (k <= 1100)))
    victims = t.cleanup_metadata(retention_hours=0)
    fresh = TxLogTable(spark, t.path)
    floor = fresh._earliest_version()
    try:
        fresh.read(version=floor - 1)
        refused = False
    except ValueError as e:
        refused = "retained log" in str(e)
    hist_ok = [h["version"] for h in fresh.history()][0] == floor
    gone = bool(victims) and not any(
        _os.path.exists(p) for p in victims) and not _glob.glob(
        _os.path.join(fresh.log_dir, "00000000.json"))
    return (fresh.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("floor_positive", F.lit(floor > 0).cast("int"))
            .withColumn("pre_floor_refused", F.lit(refused).cast("int"))
            .withColumn("history_starts_at_floor",
                        F.lit(hist_ok).cast("int"))
            .withColumn("old_log_files_gone", F.lit(gone).cast("int"))
            .orderBy("o_orderpriority"))


@register(
    "sql_merge_into_txlog",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), upd AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM upd
      UNION ALL
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1                          AS merge_version
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "merge", "sql", "engine"),
)
def sql_merge_into_txlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's command-string DML surface end-to-end: a literal
    ``MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    INSERT *`` statement goes through ``Engine.sql`` (the state machine
    the reference's replicated log fed into, /root/reference/src/raft/
    node.go:16-19) and lands on the native txlog table's copy-on-write
    merge; the post-merge aggregate is read back through the SAME SQL
    surface.  The emitted merge_version certifies the commit audit
    (CREATE=0, this MERGE=1), and the values certify the merge itself.
    tests/test_server.py replays the identical statement through the
    CommandLog for the durability arm."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("sqlmerge", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("txlog_orders", t)
    (orders.filter((F.col("o_orderkey") > 500)
                   & (F.col("o_orderkey") <= 1500))
     .select("o_orderkey", "o_orderpriority", (cents + 7).alias("cents"))
     .createOrReplaceTempView("order_updates"))
    ack = engine.sql(
        "MERGE INTO txlog_orders AS t USING order_updates AS u "
        "ON t.o_orderkey = u.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *")
    version = ack.collect()[0]["version"]
    return (engine.sql(
        "SELECT o_orderpriority, COUNT(*) AS n_rows, "
        "       SUM(cents) AS total_cents "
        "FROM txlog_orders GROUP BY o_orderpriority ORDER BY o_orderpriority")
        .withColumn("merge_version", F.lit(version).cast("int")))


@register(
    "delta_merge_full_clauses",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), src AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), tgt AS (
      SELECT b.o_orderkey,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
                  ELSE b.o_orderpriority END AS o_orderpriority,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.cents + 1
                  WHEN b.o_orderkey % 10 = 0 THEN b.cents + 100
                  ELSE b.cents END AS cents
      FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
      WHERE s.o_orderkey IS NULL OR b.o_orderkey % 3 <> 0
    ), final AS (
      SELECT * FROM tgt
      UNION ALL
      SELECT o_orderkey, o_orderpriority, cents FROM src
      WHERE o_orderkey > 1000 AND o_orderkey <= 1400
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           MIN(o_orderkey)            AS min_key,
           MAX(o_orderkey)            AS max_key
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "merge", "sql", "engine"),
)
def delta_merge_full_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-clause MERGE (Delta's three-arm statement) end-to-end through
    the SQL surface: ordered WHEN MATCHED clauses (conditional DELETE
    first, UPDATE fallthrough), a conditional NOT MATCHED INSERT, and a
    conditional NOT MATCHED BY SOURCE UPDATE — all in ONE statement and
    ONE commit.  The DuckDB oracle recomputes every arm relationally
    (LEFT JOIN + CASE), so a hash match certifies clause ORDER, per-arm
    conditions, and the parser's alias rebinding simultaneously.

    Physical shape at 100 TB: the source is broadcast, one pass decides
    each row's clause, and only segments containing a row that actually
    CHANGES are rewritten (a matched row whose conditions all fail never
    touches its file) — see TxLogTable.merge_full."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("mergefull", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("mf_orders", t)
    (orders.filter((F.col("o_orderkey") > 500)
                   & (F.col("o_orderkey") <= 1500))
     .select("o_orderkey", "o_orderpriority", (cents + 7).alias("cents"))
     .createOrReplaceTempView("merge_full_src"))
    engine.sql(
        "MERGE INTO mf_orders AS t USING merge_full_src AS s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED AND t.o_orderkey % 3 = 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET cents = s.cents + 1, "
        "                             o_orderpriority = s.o_orderpriority "
        "WHEN NOT MATCHED AND s.o_orderkey <= 1400 THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 10 = 0 "
        "    THEN UPDATE SET cents = t.cents + 100")
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_data_skipping",
    # files_were_skipped is a robust BOOLEAN audit (pruning kept fewer
    # files than the snapshot holds) — exact file counts depend on range
    # partitioner sampling and would flip nondeterministically (same
    # rationale as delta_optimize_compact's flag).
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           MIN(o_orderkey)               AS min_key,
           MAX(o_orderkey)               AS max_key,
           TRUE                          AS files_were_skipped
    FROM orders
    WHERE o_orderkey BETWEEN 400 AND 700
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "data-skipping", "stats", "pruning"),
)
def delta_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-statistics data skipping: the table is written range-
    partitioned on the key, so each segment's footer min/max covers a
    disjoint key range; a key-range read then PROVES most segments
    irrelevant from commit-log stats alone (driver-side metadata — no
    data opened) and scans only the rest.  The residual filter keeps the
    result exactly equal to an unpruned filter — certified value-exactly
    here — while the audit flag certifies that pruning actually skipped
    files.  At 100 TB this is the entire difference between a key/time
    range query costing a table scan and costing two segment reads."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartitionByRange(8, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("skipping", sf_dir), base,
                          overwrite=True)
    preds = [("o_orderkey", "between", (400, 700))]
    kept, total = t.prune_files(preds)
    return (
        t.read_where(preds)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
        .withColumn("files_were_skipped", F.lit(len(kept) < total))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_change_data_feed",
    oracle=f"""
    WITH matched AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000
    ), inserted AS (
      SELECT o_orderkey, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1500
    ), post_merge AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), changes AS (
      SELECT 'update_preimage'  AS change_type, 1 AS commit_version,
             o_orderkey, cents FROM matched
      UNION ALL
      SELECT 'update_postimage' AS change_type, 1 AS commit_version,
             o_orderkey, cents + 7 AS cents FROM matched
      UNION ALL
      SELECT 'insert' AS change_type, 1 AS commit_version,
             o_orderkey, cents FROM inserted
      UNION ALL
      SELECT 'delete' AS change_type, 2 AS commit_version,
             o_orderkey, cents FROM post_merge WHERE o_orderkey % 7 = 0
    )
    SELECT change_type, commit_version,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           MIN(o_orderkey)            AS min_key,
           MAX(o_orderkey)            AS max_key
    FROM changes
    GROUP BY change_type, commit_version
    ORDER BY change_type, commit_version
    """,
    tags=("acid", "delta", "cdf", "incremental"),
)
def delta_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed: a MERGE then a DELETE run with CDF enabled, and
    ``read_changes`` returns every row-level change — update preimages
    and postimages, inserts, deletes — tagged with its commit version.
    The oracle recomputes all four change classes relationally from raw
    orders, so the hash certifies the change stream itself (not just the
    final state).  This is the incremental-consumer contract: a 100 TB
    downstream pipeline (index refresh, training-set delta) tails
    ``read_changes(last_seen+1)`` instead of rescanning the table."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("cdf", sf_dir), base,
                          overwrite=True, enable_cdf=True)
    t.merge_upsert(updates, "o_orderkey")            # v1
    t.delete_where(F.col("o_orderkey") % 7 == 0)     # v2
    return (
        t.read_changes(1, 2)
        .groupBy(F.col("_change_type").alias("change_type"),
                 F.col("_commit_version").alias("commit_version"))
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
        .orderBy("change_type", "commit_version")
    )


@register(
    "delta_deletion_vectors",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                          AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT)     AS total_cents,
           TRUE                              AS segments_untouched
    FROM orders
    WHERE o_orderkey <= 1000 AND o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "deletion-vectors", "merge-on-read"),
)
def delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors: the DELETE writes only
    a (file, row position) tombstone sidecar — the audit flag certifies
    that NO data segment changed — and the read applies the tombstones
    by position (broadcast anti-join), returning exactly the
    copy-on-write result, value-certified here against relational
    recomputation.  At 100 TB this turns "delete a few rows from a 1 GB
    segment" from a 1 GB rewrite into an O(rows-deleted) sidecar write;
    the next MERGE/OPTIMIZE of the file materializes and retires the
    vector (pinned in tests/test_txlog.py)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("dv", sf_dir), base,
                          overwrite=True)
    files_before, _ = t._snapshot_files()
    t.delete_where(F.col("o_orderkey") % 7 == 0, use_dv=True)
    files_after, _ = t._snapshot_files()
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("segments_untouched",
                    F.lit(files_before == files_after))
        .orderBy("o_orderpriority")
    )


@register(
    "sql_update_delete_txlog",
    oracle=f"""
    WITH updated AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN {_CENTS} + 55 ELSE {_CENTS} END AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), final AS (
      SELECT * FROM updated WHERE o_orderkey % 11 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1                          AS update_version,
           2                          AS delete_version
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "update", "delete", "sql", "engine"),
)
def sql_update_delete_txlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE and DELETE statements end-to-end through ``Engine.sql`` —
    the rest of the reference's command-string DML surface
    (/root/reference/src/raft/node.go:16-19 carries opaque SQL through
    the replicated log; MERGE landed in r6, this adds UPDATE/DELETE).
    Both land as copy-on-write commits on the txlog table (only matched
    segments rewritten; assignments see pre-update values), the acks
    certify the commit versions, and the post-DML aggregate is read
    back through the same SQL surface and value-certified against
    relational recomputation."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("sqlupd", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("txlog_orders_ud", t)
    upd_ack = engine.sql(
        "UPDATE txlog_orders_ud SET cents = cents + 55 "
        "WHERE o_orderpriority = '1-URGENT'")
    upd_version = upd_ack.collect()[0]["version"]
    del_ack = engine.sql(
        "DELETE FROM txlog_orders_ud WHERE o_orderkey % 11 = 0")
    del_version = del_ack.collect()[0]["version"]
    return (engine.sql(
        "SELECT o_orderpriority, COUNT(*) AS n_rows, "
        "       SUM(cents) AS total_cents "
        "FROM txlog_orders_ud GROUP BY o_orderpriority "
        "ORDER BY o_orderpriority")
        .withColumn("update_version", F.lit(upd_version).cast("int"))
        .withColumn("delete_version", F.lit(del_version).cast("int")))


@register(
    "delta_cdf_incremental_agg",
    # The oracle recomputes the FINAL state directly; the Spark side
    # never touches the final table — it maintains the aggregate purely
    # from (base version) + (signed change rows).  A hash match proves
    # incremental maintenance == full recompute.
    oracle=f"""
    WITH post_merge AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM post_merge WHERE o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "cdf", "incremental", "mv"),
)
def delta_cdf_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance from the Change Data Feed: the
    per-priority (count, cents) aggregate is computed ONCE at version 0
    and then advanced to version 2 purely by folding in signed change
    rows (+1 for insert/update_postimage, -1 for delete/update_preimage)
    — the v2 table itself is never read.  The oracle recomputes v2 from
    scratch, so the hash certifies incremental == full.  This is the
    100 TB materialized-view contract: refresh cost scales with the
    change volume, not the table."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("cdfagg", sf_dir), base,
                          overwrite=True, enable_cdf=True)
    t.merge_upsert(updates, "o_orderkey")            # v1
    t.delete_where(F.col("o_orderkey") % 7 == 0)     # v2
    base_agg = (t.read(version=0)
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n0"),
                     F.sum("cents").alias("c0")))
    sign = F.when(F.col("_change_type").isin("insert", "update_postimage"),
                  F.lit(1)).otherwise(F.lit(-1))
    delta = (t.read_changes(1, 2)
             .withColumn("sign", sign)
             .groupBy("o_orderpriority")
             .agg(F.sum("sign").alias("dn"),
                  F.sum(F.col("sign") * F.col("cents")).alias("dc")))
    return (base_agg.join(delta, "o_orderpriority", "full_outer")
            .select(
                "o_orderpriority",
                (F.coalesce("n0", F.lit(0))
                 + F.coalesce("dn", F.lit(0))).alias("n_rows"),
                (F.coalesce("c0", F.lit(0))
                 + F.coalesce("dc", F.lit(0))).alias("total_cents"))
            .filter(F.col("n_rows") > 0)
            .orderBy("o_orderpriority"))


@register(
    "stream_txlog_cdf_source",
    oracle=f"""
    WITH matched AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000
    ), inserted AS (
      SELECT o_orderkey, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1500
    ), post_merge AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), changes AS (
      SELECT 'insert' AS change_type, 0 AS commit_version,
             o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
      UNION ALL
      SELECT 'update_preimage', 1, o_orderkey, cents FROM matched
      UNION ALL
      SELECT 'update_postimage', 1, o_orderkey, cents + 7 FROM matched
      UNION ALL
      SELECT 'insert', 1, o_orderkey, cents FROM inserted
      UNION ALL
      SELECT 'delete', 2, o_orderkey, cents
      FROM post_merge WHERE o_orderkey % 7 = 0
    )
    SELECT change_type, commit_version,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           MIN(o_orderkey)            AS min_key,
           MAX(o_orderkey)            AS max_key
    FROM changes
    GROUP BY change_type, commit_version
    ORDER BY change_type, commit_version
    """,
    tags=("acid", "delta", "cdf", "streaming", "source", "datasource-api"),
)
def stream_txlog_cdf_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed as a real Structured Streaming SOURCE
    (sources/txlog_stream.py, the PySpark 4 Python DataSource streaming
    extension point): ``readStream.format("txlogcdf")`` replays the
    table's commits as micro-batches whose offsets ARE commit versions —
    deterministic, failure-replayable, exactly-once downstream of a
    checkpointed sink — and a streaming aggregation over the change
    stream is certified value-exact against relational recomputation
    of all three commits (CREATE inserts, MERGE pre/postimages +
    inserts, DELETE).  The reference streams its replicated log into
    state machines (replication.go:88-103); here the commit log is the
    stream."""
    from ..sources.txlog_stream import register_txlog_cdf_source
    from ..streaming.jobs import run_to_completion

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("cdfstream", sf_dir), base,
                          overwrite=True, enable_cdf=True)
    t.merge_upsert(updates, "o_orderkey")            # v1
    t.delete_where(F.col("o_orderkey") % 7 == 0)     # v2
    register_txlog_cdf_source(spark)
    stream = (spark.readStream.format("txlogcdf")
              .option("path", t.path).load())
    agg = (stream
           .groupBy(F.col("_change_type").alias("change_type"),
                    F.col("_commit_version").alias("commit_version"))
           .agg(F.count("*").alias("n_rows"),
                F.sum("cents").alias("total_cents"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key")))
    return (run_to_completion(agg, "complete")
            .orderBy("change_type", "commit_version"))


@register(
    "delta_restore",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), upd AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM upd
      UNION ALL
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           3                          AS restore_commit_version
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "restore", "time-travel"),
)
def delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE rolls the table back to a known-good version AS A NEW
    COMMIT: after a MERGE (v1) and a bad DELETE (v2), ``restore(1)``
    commits v3 whose snapshot equals v1 exactly — certified value-exact
    against relational recomputation of the post-MERGE state — while v2
    stays in history for audit/time travel (pinned in
    tests/test_txlog.py, including deletion-vector state restoration).
    The operational undo button every production table format needs:
    O(file-set) metadata, zero data rewritten."""
    t = _build_merged_table(spark, sf_dir, "restore")    # v0 + v1
    t.delete_where(F.col("o_orderkey") % 7 == 0)         # v2 (the mistake)
    v = t.restore(1)                                     # v3 == v1 content
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("restore_commit_version", F.lit(v).cast("int"))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_partitioned_table",
    oracle=f"""
    SELECT o_orderkey % 10                 AS key_bucket,
           COUNT(*)                        AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT)   AS total_cents,
           TRUE                            AS partitions_were_pruned
    FROM orders
    WHERE o_orderkey <= 1000 AND o_orderpriority = '1-URGENT'
    GROUP BY o_orderkey % 10
    ORDER BY key_bucket
    """,
    tags=("acid", "delta", "partitioning", "pruning", "hive-layout"),
)
def delta_partitioned_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive/Delta-layout PARTITIONED txlog table: the CREATE writes
    files under ``o_orderpriority=<value>/`` dirs, every add action
    records the file's partitionValues, and an equality read proves the
    irrelevant partitions skippable from commit metadata alone (audit
    flag) before scanning only the matching partition — with the
    residual filter keeping the result exactly equal to a full-scan
    filter, value-certified here.  At 100 TB partition layout is the
    first-order data-placement decision; stats-based skipping
    (delta_data_skipping) composes with it for range predicates inside
    a partition."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("partitioned", sf_dir), base,
                          overwrite=True, partition_by="o_orderpriority")
    preds = [("o_orderpriority", "=", "1-URGENT")]
    kept, total = t.prune_files(preds)
    return (
        t.read_where(preds)
        .groupBy((F.col("o_orderkey") % 10).alias("key_bucket"))
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("partitions_were_pruned", F.lit(len(kept) < total))
        .orderBy("key_bucket")
    )


@register(
    "delta_idempotent_stream_sink",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           TRUE                          AS replay_was_noop
    FROM orders
    WHERE o_orderkey <= 1000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "streaming", "sink", "exactly-once", "txn"),
)
def delta_idempotent_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion into the txlog format: a file
    stream lands in the table through ``streaming_sink`` (foreachBatch +
    Delta's txnAppId/txnVersion idempotency — each epoch id is recorded
    as a ``txn`` action), and a deliberately REPLAYED epoch commits
    nothing (audit flag, from the commit log's own version counter).
    The final table state hashes exactly to the source aggregate, so
    at-least-once foreachBatch delivery + idempotent commit = effective
    exactly-once — the only ingestion contract that survives restarts
    on a 100 TB streaming pipeline.  The reference's exactly-once
    ordered apply (replication.go:88-103) is the same contract over
    command strings."""
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    data = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    src = _table_dir("sinksrc", sf_dir)
    data.write.mode("overwrite").parquet(src)
    empty = spark.createDataFrame([], data.schema)
    t = TxLogTable.create(spark, _table_dir("sink", sf_dir), empty,
                          overwrite=True)
    ck = _table_dir("sinkck", sf_dir)
    shutil.rmtree(ck, ignore_errors=True)  # fresh table ⇒ fresh offsets
    sink = t.streaming_sink("orders_ingest")
    stream = spark.readStream.schema(data.schema).parquet(src)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    v_before = t.latest_version()
    sink(spark.read.parquet(src), 0)  # replayed epoch: must be a no-op
    replay_noop = t.latest_version() == v_before
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("replay_was_noop", F.lit(replay_noop))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_check_constraint",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           TRUE                          AS violation_rejected
    FROM orders
    WHERE o_orderkey <= 1500
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "constraint", "sql", "engine"),
)
def delta_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints, end-to-end through the SQL surface:
    ``ALTER TABLE … ADD CONSTRAINT … CHECK (cents > 0)`` routes through
    ``Engine.sql`` to the txlog table; a conforming append lands, a
    violating append RAISES and commits nothing (audit flag), and the
    final state hashes to base + valid rows only.  Enforcement costs one
    aggregate over the rows being written — never a table scan — which
    is what makes constraints affordable on a 100 TB table."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("constraint", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("txlog_orders_ck", t)
    engine.sql("ALTER TABLE txlog_orders_ck ADD CONSTRAINT cents_positive "
               "CHECK (cents > 0)")
    valid = (orders
             .filter((F.col("o_orderkey") > 1000)
                     & (F.col("o_orderkey") <= 1500))
             .select("o_orderkey", "o_orderpriority", cents.alias("cents")))
    t.append(valid)
    bad = (orders.filter(F.col("o_orderkey") <= 100)
           .select((F.col("o_orderkey") + 2000000).alias("o_orderkey"),
                   "o_orderpriority", (-cents).alias("cents")))
    rejected = False
    try:
        t.append(bad)
    except ValueError:
        rejected = True
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("violation_rejected", F.lit(rejected))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_shallow_clone",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), upd AS (
      SELECT o_orderkey, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), cl AS (
      SELECT * FROM upd
      UNION ALL
      SELECT * FROM src
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    )
    SELECT 'clone' AS side, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE AS zero_copy
    FROM cl
    UNION ALL
    SELECT 'source' AS side, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE AS zero_copy
    FROM src
    ORDER BY side
    """,
    tags=("acid", "delta", "clone", "zero-copy"),
)
def delta_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE: the clone's commit 0 references the source
    snapshot's segments by path — the audit flag certifies that NO data
    file was copied at clone time — after which a MERGE into the clone
    rewrites only its own view of the touched segments.  The hash
    certifies both sides at once: the clone equals the post-merge state
    and the SOURCE still equals its original state (isolation).  At
    100 TB this is how a dev/experiment copy of a production table
    costs O(file-count) metadata instead of a 100 TB copy."""
    import os as _os

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    src_t = TxLogTable.create(spark, _table_dir("clonesrc", sf_dir), base,
                              overwrite=True)
    clone_path = _table_dir("clonedst", sf_dir)
    import shutil
    shutil.rmtree(clone_path, ignore_errors=True)
    clone = src_t.clone_to(clone_path)
    zero_copy = not any(p.startswith("data-")
                        for p in _os.listdir(clone_path))
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    clone.merge_upsert(updates, "o_orderkey")
    agg = lambda df, side: (df.agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("total_cents"))
        .select(F.lit(side).alias("side"), "n_rows", "total_cents"))
    return (agg(clone.read(), "clone")
            .unionByName(agg(src_t.read(), "source"))
            .withColumn("zero_copy", F.lit(zero_copy))
            .orderBy("side"))


@register(
    "delta_materialized_view",
    oracle=f"""
    WITH fin AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey > 500 THEN {_CENTS} + 7
                  ELSE {_CENTS} END AS cents
      FROM orders
      WHERE o_orderkey <= 1500 AND o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE AS fold_at_source_head
    FROM fin
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "mv", "cdf", "incremental", "sql", "engine"),
)
def delta_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MATERIALIZED VIEW / REFRESH MATERIALIZED VIEW end-to-end
    through the SQL surface: the per-priority (count, cents) aggregate
    is stored as its OWN ACID txlog table, filled once from the source
    snapshot, then advanced to the post-MERGE/post-DELETE state purely
    by folding the source's CDF rows — the mutated source is never
    rescanned (the fold marker rides the MERGE commit as a txn action,
    audited at the source head).  The oracle recomputes the final state
    from scratch, so the hash certifies incremental == full — the
    100 TB derived-table contract: refresh cost ∝ change volume."""
    from ..engine import Engine

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    import os
    import shutil
    src_path = _table_dir("mvsqlsrc", sf_dir)
    mv_path = os.path.join(os.path.dirname(os.path.abspath(src_path)),
                           "mvsqlview")
    shutil.rmtree(mv_path, ignore_errors=True)
    src = TxLogTable.create(spark, src_path, base, overwrite=True,
                            enable_cdf=True)
    engine = Engine(spark, sf_dir)
    engine.register_txlog("mvsqlsrc", src)
    engine.sql("CREATE MATERIALIZED VIEW mvsqlview AS "
               "SELECT o_orderpriority, COUNT(*) AS n_orders, "
               "SUM(cents) AS total_cents FROM mvsqlsrc "
               "GROUP BY o_orderpriority")
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    src.merge_upsert(updates, "o_orderkey")
    src.delete_where(F.col("o_orderkey") % 7 == 0)
    engine.sql("REFRESH MATERIALIZED VIEW mvsqlview")
    mv = engine.txlog_tables["mvsqlview"]
    at_head = mv.txn_version_for("mv::mvsqlview") == src.latest_version()
    return (engine._public_view(mv.read())  # hide __mv_* fold state
            .withColumn("fold_at_source_head", F.lit(bool(at_head)))
            .orderBy("o_orderpriority"))


@register(
    "delta_materialized_view_join",
    oracle=f"""
    WITH fin AS (
      SELECT o_custkey, {_CENTS} AS cents
      FROM orders
      WHERE (o_orderkey <= 1000 AND o_orderkey % 3 <> 0)
         OR (o_orderkey > 1000 AND o_orderkey <= 1400)
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE AS fold_at_source_head
    FROM fin JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("acid", "delta", "mv", "cdf", "join", "incremental", "sql",
          "engine"),
)
def delta_materialized_view_join(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """STAR-JOIN materialized view: the MV definition joins the txlog
    FACT table to the static ``customer`` dimension (broadcast) and
    groups by a DIM attribute — the canonical analytics rollup.
    Maintenance is still purely CDF-driven: each refresh joins only the
    fact's change rows (delete batch + append batch here) to the dim
    and folds signed deltas; the fact snapshot is never rescanned.  The
    oracle recomputes the rollup from scratch — the hash certifies the
    incremental join-fold equals the full join."""
    from ..engine import Engine

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_custkey", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    import os
    import shutil
    src_path = _table_dir("mvjoinsrc", sf_dir)
    mv_path = os.path.join(os.path.dirname(os.path.abspath(src_path)),
                           "mvjoinview")
    shutil.rmtree(mv_path, ignore_errors=True)
    src = TxLogTable.create(spark, src_path, base, overwrite=True,
                            enable_cdf=True)
    engine = Engine(spark, sf_dir)
    engine.register_txlog("mvjoinsrc", src)
    engine.sql("CREATE MATERIALIZED VIEW mvjoinview AS "
               "SELECT c_mktsegment, COUNT(*) AS n_orders, "
               "SUM(cents) AS total_cents FROM mvjoinsrc "
               "JOIN customer ON mvjoinsrc.o_custkey = customer.c_custkey "
               "GROUP BY c_mktsegment")
    src.delete_where(F.col("o_orderkey") % 3 == 0)
    src.append(orders
               .filter((F.col("o_orderkey") > 1000)
                       & (F.col("o_orderkey") <= 1400))
               .select("o_orderkey", "o_custkey", cents.alias("cents"))
               .repartition(4, "o_orderkey"))
    engine.sql("REFRESH MATERIALIZED VIEW mvjoinview")
    mv = engine.txlog_tables["mvjoinview"]
    at_head = (mv.txn_version_for("mv::mvjoinview")
               == src.latest_version())
    return (engine._public_view(mv.read())  # hide __mv_* fold state
            .withColumn("fold_at_source_head", F.lit(bool(at_head)))
            .orderBy("c_mktsegment"))


@register(
    "delta_materialized_view_cascade",
    oracle=f"""
    WITH upd AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), fin AS (
      SELECT * FROM upd WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey <= 500 AND o_orderkey % 7 <> 0
    ), l1 AS (
      SELECT o_orderpriority, COUNT(*) AS n, SUM(cents) AS total
      FROM fin GROUP BY o_orderpriority
    )
    SELECT n, COUNT(*) AS n_groups,
           CAST(SUM(total) AS BIGINT) AS sum_total,
           TRUE AS cascaded
    FROM l1 GROUP BY n
    ORDER BY n
    """,
    tags=("acid", "delta", "mv", "cdf", "cascade", "incremental", "sql",
          "engine"),
)
def delta_materialized_view_cascade(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """CASCADING materialized views: mv2 (a histogram of mv1's group
    sizes) is defined OVER mv1 and maintains itself from MV1'S OWN
    change feed — after source churn, refreshing mv1 then mv2
    propagates the deltas through TWO incremental stages without
    rescanning either input.  The oracle recomputes the two-level
    aggregate from scratch; the hash certifies the cascaded folds equal
    the full pipeline — the multi-stage DLT-style shape."""
    from ..engine import Engine

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    import os
    import shutil
    src_path = _table_dir("mvcascsrc", sf_dir)
    for nm in ("mvcasc1", "mvcasc2"):
        shutil.rmtree(os.path.join(
            os.path.dirname(os.path.abspath(src_path)), nm),
            ignore_errors=True)
    src = TxLogTable.create(spark, src_path, base, overwrite=True,
                            enable_cdf=True)
    engine = Engine(spark, sf_dir)
    engine.register_txlog("mvcascsrc", src)
    engine.sql("CREATE MATERIALIZED VIEW mvcasc1 AS "
               "SELECT o_orderpriority, COUNT(*) AS n, "
               "SUM(cents) AS total FROM mvcascsrc "
               "GROUP BY o_orderpriority")
    engine.sql("CREATE MATERIALIZED VIEW mvcasc2 AS "
               "SELECT n, COUNT(*) AS n_groups, SUM(total) AS sum_total "
               "FROM mvcasc1 GROUP BY n")
    src.merge_upsert(
        orders.filter((F.col("o_orderkey") > 500)
                      & (F.col("o_orderkey") <= 1500))
        .select("o_orderkey", "o_orderpriority",
                (cents + 7).alias("cents"))
        .repartition(4, "o_orderkey"), "o_orderkey")
    src.delete_where(F.col("o_orderkey") % 7 == 0)
    engine.sql("REFRESH MATERIALIZED VIEW mvcasc1")
    engine.sql("REFRESH MATERIALIZED VIEW mvcasc2")
    return (engine._public_view(engine.txlog_tables["mvcasc2"].read())
            .withColumn("cascaded", F.lit(True))
            .orderBy("n"))


@register(
    "delta_materialized_view_minmax",
    # Full-recompute oracle over the mutated source: the hash certifies
    # incremental == recompute for the WHOLE widened aggregate class —
    # AVG through the hidden sum/non-NULL counters, MIN/MAX through the
    # insert-arm LEAST/GREATEST fold plus the bounded per-group repair
    # (the delete and the update preimages force repairs), and the MV's
    # WHERE clause applied to scan and fold alike.  NULL cents rows
    # (k % 11 = 0) exercise the non-NULL counters.
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey AS k, o_orderpriority,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE {_CENTS} END AS cents0
      FROM orders WHERE o_orderkey <= 1300
    ), fin AS (
      SELECT o_orderpriority,
             CASE WHEN k > 300 AND k <= 600 THEN cents0 + 31
                  ELSE cents0 END AS cents
      FROM src
      WHERE ((k <= 1000 AND k % 5 <> 0) OR k > 1000) AND k % 13 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                       AS n_orders,
           ROUND(AVG(cents), 4)           AS avg_cents,
           CAST(MIN(cents) AS BIGINT)     AS min_cents,
           CAST(MAX(cents) AS BIGINT)     AS max_cents,
           TRUE                           AS fold_at_source_head
    FROM fin
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "mv", "cdf", "minmax", "avg", "incremental",
          "sql", "engine"),
)
def delta_materialized_view_minmax(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The widened MV aggregate class end-to-end: AVG (maintained via
    hidden running-sum + non-NULL counters — a group whose last non-NULL
    value is deleted returns to NULL, not 0), MIN/MAX (inserts fold with
    LEAST/GREATEST; groups that saw a delete or update-preimage repair
    with a bounded recompute — a null-safe semi join prunes the source
    scan to exactly the affected group keys), and a WHERE clause in the
    MV definition (applied to the initial scan AND every CDF fold).
    The churn — an upsert wave (+31), a modulo delete (removes group
    maxima), and an append with NULL-cents rows — folds in ONE refresh;
    the oracle recomputes everything from scratch."""
    from ..engine import Engine

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    null_cents = F.when(k % 11 == 0, F.lit(None).cast("bigint")) \
        .otherwise(cents)
    base = (orders.filter(k <= 1000)
            .select("o_orderkey", "o_orderpriority",
                    null_cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    import os
    import shutil
    src_path = _table_dir("mvmmsrc", sf_dir)
    shutil.rmtree(os.path.join(
        os.path.dirname(os.path.abspath(src_path)), "mvmmview"),
        ignore_errors=True)
    src = TxLogTable.create(spark, src_path, base, overwrite=True,
                            enable_cdf=True)
    engine = Engine(spark, sf_dir)
    engine.register_txlog("mvmmsrc", src)
    engine.sql("CREATE MATERIALIZED VIEW mvmmview AS "
               "SELECT o_orderpriority, COUNT(*) AS n_orders, "
               "AVG(cents) AS avg_cents, MIN(cents) AS min_cents, "
               "MAX(cents) AS max_cents FROM mvmmsrc "
               "WHERE o_orderkey % 13 <> 0 "
               "GROUP BY o_orderpriority")
    src.merge_upsert(
        orders.filter((k > 300) & (k <= 600))
        .select("o_orderkey", "o_orderpriority",
                (null_cents + 31).alias("cents"))
        .repartition(4, "o_orderkey"), "o_orderkey")
    src.delete_where(k % 5 == 0)
    src.append(orders.filter((k > 1000) & (k <= 1300))
               .select("o_orderkey", "o_orderpriority",
                       null_cents.alias("cents"))
               .repartition(4, "o_orderkey"))
    engine.sql("REFRESH MATERIALIZED VIEW mvmmview")
    mv = engine.txlog_tables["mvmmview"]
    at_head = mv.txn_version_for("mv::mvmmview") == src.latest_version()
    return (engine._public_view(mv.read())
            .withColumn("avg_cents", F.round("avg_cents", 4))
            .withColumn("fold_at_source_head", F.lit(bool(at_head)))
            .orderBy("o_orderpriority"))


@register(
    "delta_generate_manifest",
    oracle=f"""
    WITH upd AS (
      SELECT o_orderkey, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), fin AS (
      SELECT o_orderkey, cents FROM upd
      UNION ALL
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey <= 500
        AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE AS via_manifest
    FROM fin WHERE o_orderkey % 7 <> 0
    """,
    tags=("acid", "delta", "manifest", "interop", "sql", "engine"),
)
def delta_generate_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATE symlink_format_manifest: after a MERGE and a
    copy-on-write DELETE, the manifest lists exactly the data files
    active at the head — and the query reads the snapshot THROUGH the
    manifest (plain ``spark.read.parquet`` of the listed files, no log
    involved), the way Presto/Trino/Athena consume Delta tables.  The
    oracle recomputes the expected state from ``orders``; a stale or
    over-complete manifest would hash-mismatch."""
    from ..engine import Engine

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("manifest", sf_dir), base,
                          overwrite=True)
    t.merge_upsert(
        orders.filter((F.col("o_orderkey") > 500)
                      & (F.col("o_orderkey") <= 1500))
        .select("o_orderkey", (cents + 7).alias("cents"))
        .repartition(4, "o_orderkey"), "o_orderkey")
    t.delete_where(F.col("o_orderkey") % 7 == 0)  # copy-on-write
    engine = Engine(spark, sf_dir)
    engine.register_txlog("manifest_t", t)
    manifest = engine.sql(
        "GENERATE symlink_format_manifest FOR TABLE manifest_t"
    ).collect()[0]["manifest"]
    files = [ln for ln in open(manifest).read().splitlines() if ln]
    return (spark.read.parquet(*files)
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("via_manifest", F.lit(True)))


@register(
    "delta_deep_clone",
    oracle=f"""
    SELECT COUNT(*)                   AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           TRUE AS deep_copy, TRUE AS incremental_refresh,
           TRUE AS survives_source_vacuum
    FROM orders
    WHERE o_orderkey <= 2000
      AND NOT (o_orderkey <= 1000 AND o_orderkey % 7 = 0)
    """,
    tags=("acid", "delta", "clone", "deep", "sql", "engine"),
)
def delta_deep_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEEP CLONE + INCREMENTAL refresh, end-to-end: (1) clone copies
    segment bytes executor-side (audited: the clone root holds its own
    data files); (2) the source moves on — an append plus a DV delete —
    and ``clone_refresh`` fast-forwards the clone by copying ONLY the
    new segments (audited: every pre-refresh copy is still there
    untouched and the copy count grew — cost ∝ change, not table size);
    (3) the source compacts and VACUUMs at retention 0, which would
    ghost a SHALLOW clone — the deep clone still reads (audited by the
    hash itself).  The final state the oracle certifies: source keys
    ≤ 2000 minus the DV-deleted (k ≤ 1000 AND k % 7 = 0) rows."""
    import os as _os

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    src_t = TxLogTable.create(spark, _table_dir("deepsrc", sf_dir), base,
                              overwrite=True)
    src_t.delete_where(
        (F.col("o_orderkey") <= 1000) & (F.col("o_orderkey") % 7 == 0),
        use_dv=True)
    clone_path = _table_dir("deepdst", sf_dir)
    import shutil
    shutil.rmtree(clone_path, ignore_errors=True)
    clone = src_t.clone_to(clone_path, mode="deep")
    deep_copy = any(p.startswith("data-") for p in _os.listdir(clone_path))
    copies_before = {p for p in _os.listdir(clone_path)
                     if p.startswith("data-")}
    src_t.append(orders
                 .filter((F.col("o_orderkey") > 1000)
                         & (F.col("o_orderkey") <= 2000))
                 .select("o_orderkey", cents.alias("cents"))
                 .repartition(4, "o_orderkey"))
    clone.clone_refresh()
    copies_after = {p for p in _os.listdir(clone_path)
                    if p.startswith("data-")}
    incremental = (copies_before <= copies_after
                   and len(copies_after) > len(copies_before))
    src_t.optimize_compact()
    src_t.vacuum(retention_seconds=0)
    return (clone.read().agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("total_cents"))
        .withColumn("deep_copy", F.lit(bool(deep_copy)))
        .withColumn("incremental_refresh", F.lit(bool(incremental)))
        .withColumn("survives_source_vacuum", F.lit(True)))


@register(
    "delta_zorder_optimize",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey, o_orderkey % 97 AS x, o_custkey % 89 AS y,
             {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 8000
    )
    SELECT COUNT(*)                      AS n_rows,
           CAST(SUM(cents) AS BIGINT)    AS total_cents,
           MIN(o_orderkey)               AS min_key,
           MAX(o_orderkey)               AS max_key,
           TRUE                          AS x_files_skipped,
           TRUE                          AS y_files_skipped
    FROM t WHERE x BETWEEN 10 AND 15 AND y BETWEEN 10 AND 15
    """,
    tags=("acid", "delta", "zorder", "layout", "pruning", "sql", "engine"),
)
def delta_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER BY, end-to-end through the SQL surface: the table
    starts as 8 randomly-partitioned segments (every file spans the full
    range of both dims — zero pruning possible), then ``OPTIMIZE …
    ZORDER BY (x, y)`` rewrites it Morton-ordered, after which file
    stats prune segments for SINGLE-dimension predicates on EITHER
    column (both audit flags — the property a one-column sort cannot
    give the second dimension), and a 2-D box read returns exactly the
    full-scan answer, value-certified.  At 100 TB z-ordering is the
    difference between multi-dimension lookups scanning the table and
    scanning a handful of segments."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 8000)
            .select("o_orderkey",
                    (F.col("o_orderkey") % 97).alias("x"),
                    (F.col("o_custkey") % 89).alias("y"),
                    cents.alias("cents"))
            .repartition(8))
    t = TxLogTable.create(spark, _table_dir("zorder", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("txlog_orders_z", t)
    engine.sql("OPTIMIZE txlog_orders_z ZORDER BY (x, y)")
    kept_x, total = t.prune_files([("x", "between", (10, 15))])
    kept_y, _ = t.prune_files([("y", "between", (10, 15))])
    box = [("x", "between", (10, 15)), ("y", "between", (10, 15))]
    return (
        t.read_where(box)
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
        .withColumn("x_files_skipped", F.lit(len(kept_x) < total))
        .withColumn("y_files_skipped", F.lit(len(kept_y) < total))
    )


@register(
    "delta_streaming_mv",
    # The oracle recomputes the FINAL aggregate from scratch; the Spark
    # side maintains it incrementally — CDF stream in, signed fold per
    # micro-batch, MERGE into a SECOND txlog table (the MV store).  A
    # hash match proves streamed incremental maintenance == full
    # recompute, end-to-end through the ACID layer on both sides.
    oracle=f"""
    WITH post_merge AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM post_merge WHERE o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE                       AS mv_stored_acid
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "cdf", "streaming", "mv", "incremental"),
)
def delta_streaming_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance, fully composed from the
    engine's own parts: the source table's Change Data Feed is consumed
    as a Structured Streaming source (``format("txlogcdf")``), each
    micro-batch is folded into signed per-group deltas (+1 insert/
    postimage, -1 delete/preimage), and the running aggregate is
    MERGEd into a SECOND txlog table — so the MV itself is ACID,
    versioned, and time-travelable.  The MV table is never recomputed
    from the source; the oracle recomputes it from scratch, and the
    hash match certifies streamed-incremental == full.  This is the
    100 TB shape for keeping derived tables fresh: refresh cost ∝
    change volume, the MV store survives restarts (checkpointed
    offsets + idempotent-by-key MERGE), and consumers read a plain
    table."""
    import shutil

    from ..sources.txlog_stream import register_txlog_cdf_source

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    src = TxLogTable.create(spark, _table_dir("mvsrc", sf_dir), base,
                            overwrite=True, enable_cdf=True)
    src.merge_upsert(updates, "o_orderkey")          # v1
    src.delete_where(F.col("o_orderkey") % 7 == 0)   # v2
    mv = TxLogTable.create(
        spark, _table_dir("mvdst", sf_dir),
        spark.createDataFrame(
            [], "o_orderpriority string, n_rows long, total_cents long"),
        overwrite=True)
    ck = _table_dir("mvck", sf_dir)
    shutil.rmtree(ck, ignore_errors=True)  # fresh tables ⇒ fresh offsets

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1)).otherwise(F.lit(-1))
        delta = (batch_df.withColumn("sign", sign)
                 .groupBy("o_orderpriority")
                 .agg(F.sum("sign").alias("dn"),
                      F.sum(F.col("sign") * F.col("cents")).alias("dc")))
        merged = (mv.read().join(delta, "o_orderpriority", "full_outer")
                  .select(
                      "o_orderpriority",
                      (F.coalesce("n_rows", F.lit(0))
                       + F.coalesce("dn", F.lit(0))).alias("n_rows"),
                      (F.coalesce("total_cents", F.lit(0))
                       + F.coalesce("dc", F.lit(0))).alias("total_cents"))
                  .filter(F.col("n_rows") > 0))
        mv.merge_upsert(merged, "o_orderpriority")

    register_txlog_cdf_source(spark)
    q = (spark.readStream.format("txlogcdf")
         .option("path", src.path).load()
         .writeStream.foreachBatch(fold)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (mv.read()
            .withColumn("mv_stored_acid", F.lit(True))
            .orderBy("o_orderpriority"))


@register(
    "delta_metadata_count",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE                     AS metadata_only
    FROM orders
    WHERE o_orderkey <= 1500 AND o_orderkey % 7 <> 0
    """,
    tags=("acid", "delta", "stats", "metadata-only", "count"),
)
def delta_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT(*): after an append and a deletion-vector
    DELETE, ``count_rows`` answers from per-file ``numRecords`` stats
    minus the DV tombstone count — no data file is opened (the audit
    flag is the method's own metadata_only bit), and the value is
    certified against DuckDB's real count over the equivalent rows.
    At 100 TB this is the difference between the most common query in
    any pipeline costing a table scan and costing an O(files) fold
    over commit metadata."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    more = (orders
            .filter((F.col("o_orderkey") > 1000)
                    & (F.col("o_orderkey") <= 1500))
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("metacount", sf_dir), base,
                          overwrite=True)
    t.append(more)
    t.delete_where(F.col("o_orderkey") % 7 == 0, use_dv=True)
    n, metadata_only = t.count_rows()
    return spark.createDataFrame(
        [(n, metadata_only)], "n_rows long, metadata_only boolean")


@register(
    "delta_generated_columns",
    oracle=f"""
    SELECT o_orderkey % 8                AS key_bucket,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           TRUE                          AS partitions_were_pruned,
           TRUE                          AS bad_value_rejected
    FROM orders
    WHERE o_orderkey <= 1500 AND o_orderkey % 8 IN (2, 5)
    GROUP BY o_orderkey % 8
    ORDER BY key_bucket
    """,
    tags=("acid", "delta", "generated-columns", "partitioning", "pruning"),
)
def delta_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated columns, Delta's flagship partition pattern: the table
    is PARTITIONED BY a column the writer never supplies — ``key_bucket``
    is derived from its expression at write time (CREATE and the later
    append both omit it), an append that DOES supply it with wrong
    values is rejected (audit flag — silently accepting it would poison
    partition pruning forever), and an equality read prunes partitions
    from commit metadata exactly as if the column were physical,
    value-certified against relational recomputation.  At 100 TB this
    is how day(ts)-partitioned ingest works without trusting every
    writer to precompute the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(
        spark, _table_dir("gencol", sf_dir), base, overwrite=True,
        partition_by="key_bucket",
        generated_columns={"key_bucket": "o_orderkey % 8"})
    more = (orders
            .filter((F.col("o_orderkey") > 1000)
                    & (F.col("o_orderkey") <= 1500))
            .select("o_orderkey", "o_orderpriority", cents.alias("cents")))
    t.append(more)  # generated column computed, not supplied
    bad = more.withColumn("key_bucket", F.lit(0))  # wrong derived values
    rejected = False
    try:
        t.append(bad)
    except ValueError:
        rejected = True
    kept, total = t.prune_files([("key_bucket", "=", "2")])
    two_parts = (
        t.read_where([("key_bucket", "=", "2")])
        .unionByName(t.read_where([("key_bucket", "=", "5")])))
    return (
        two_parts
        .groupBy(F.col("key_bucket").cast("long").alias("key_bucket"))
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("partitions_were_pruned", F.lit(len(kept) < total))
        .withColumn("bad_value_rejected", F.lit(rejected))
        .orderBy("key_bucket")
    )


@register(
    "delta_bloom_skipping",
    # The probe key is data-derived identically on both sides (min key
    # above 100), so the oracle stays valid across testdata regens.
    oracle=f"""
    WITH probe AS (
      SELECT MIN(o_orderkey) AS pk FROM orders WHERE o_orderkey > 100
    )
    SELECT o.o_orderkey                    AS probe_key,
           COUNT(*)                        AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT)   AS total_cents,
           TRUE                            AS bloom_files_skipped,
           TRUE                            AS bloom_beats_range_stats
    FROM orders o JOIN probe p ON o.o_orderkey = p.pk
    GROUP BY o.o_orderkey
    """,
    tags=("acid", "delta", "bloom", "index", "pruning", "point-lookup"),
)
def delta_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom filter index (Delta's bloom filter index): the
    table is HASH-distributed on the key, so segment min/max ranges
    nearly all span the probe and range stats can prune almost nothing
    — the second audit flag certifies the bloom kept STRICTLY fewer
    files than range stats alone (robust across data regens, unlike
    pinning range pruning to exactly zero, which a lucky file min can
    break) — while a point lookup skips most segments because their
    blooms prove the key absent (first audit flag; a bloom negative is
    proof, positives fall through).  The looked-up
    row itself is value-certified against the raw table.  At 100 TB
    this is the difference between a point lookup on a non-partition
    key scanning the table and scanning ~1 file — the write-side cost
    is one indexed-column read per segment at commit time."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 4000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(8, "o_orderkey"))  # hash layout: ranges overlap
    t = TxLogTable.create(spark, _table_dir("bloom", sf_dir), base,
                          overwrite=True,
                          bloom_filter_columns=["o_orderkey"])
    probe = (orders.filter(F.col("o_orderkey") > 100)
             .agg(F.min("o_orderkey")).collect()[0][0])
    kept, total = t.prune_files([("o_orderkey", "=", probe)])
    # range-stats-only pruning (blooms masked) keeps nearly all: the
    # hash layout makes min/max useless for a point key
    active, _ = t._snapshot(None)
    range_kept = [
        p for p, s in active.items()
        if _range_only_match(s, "o_orderkey", probe)
    ]
    return (
        t.read_where([("o_orderkey", "=", probe)])
        .groupBy(F.col("o_orderkey").alias("probe_key"))
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("bloom_files_skipped", F.lit(len(kept) < total))
        .withColumn("bloom_beats_range_stats",
                    F.lit(len(kept) < len(range_kept)))
    )


def _range_only_match(stats, col, value):
    """min/max-only view of _file_may_match (blooms masked) — used to
    certify that range stats alone could not have pruned."""
    from ..sources.txlog import _file_may_match
    if stats is None:
        return True
    masked = {k: v for k, v in stats.items() if k != "bloom"}
    return _file_may_match(masked, col, "=", value)


@register(
    "delta_convert_in_place",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), upd AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    ), final AS (
      SELECT * FROM upd
      UNION ALL
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE                       AS adopted_without_copy
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "convert", "adoption", "zero-copy"),
)
def delta_convert_in_place(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT TO DELTA in place: a pre-existing PLAIN parquet directory
    (written by an ordinary spark.write, no log) is adopted as a txlog
    table — commit 0 lists the existing files with footer stats, no
    byte copied or rewritten (audit flag: the directory's file set is
    unchanged by conversion) — and then ordinary ACID MERGE runs on it,
    with the post-merge state value-certified.  At 100 TB this is the
    adoption path for an existing parquet lake: ACID from the next
    commit, zero rewrite."""
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    plain_dir = _table_dir("convert", sf_dir)
    shutil.rmtree(plain_dir, ignore_errors=True)
    (orders.filter(F.col("o_orderkey") <= 1000)
     .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
     .repartition(4, "o_orderkey")
     .write.parquet(plain_dir))
    import os as _os
    files_before = sorted(f for f in _os.listdir(plain_dir)
                          if f.endswith(".parquet"))
    t = TxLogTable.convert_from_parquet(spark, plain_dir)
    files_after = sorted(f for f in _os.listdir(plain_dir)
                         if f.endswith(".parquet"))
    no_copy = files_before == files_after
    updates = (orders
               .filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 1500))
               .select("o_orderkey", "o_orderpriority",
                       (cents + 7).alias("cents"))
               .repartition(4, "o_orderkey"))
    t.merge_upsert(updates, "o_orderkey")
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"))
        .withColumn("adopted_without_copy", F.lit(no_copy))
        .orderBy("o_orderpriority")
    )


@register(
    "stream_txlog_table_source",
    oracle=f"""
    WITH appended AS (
      SELECT o_orderkey, {_CENTS} AS cents,
             CASE WHEN o_orderkey <= 1000 THEN 0 ELSE 1 END AS commit_version
      FROM orders WHERE o_orderkey <= 1500
    )
    SELECT commit_version,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           MIN(o_orderkey)            AS min_key,
           MAX(o_orderkey)            AS max_key
    FROM appended
    GROUP BY commit_version
    ORDER BY commit_version
    """,
    tags=("acid", "delta", "streaming", "source", "append-only",
          "datasource-api"),
)
def stream_txlog_table_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txlog TABLE as an append-only Structured Streaming source
    (``readStream.format("txlogtable")``) — Delta's default table
    streaming mode, no CDF required: micro-batch N is exactly the rows
    the N-th commit appended (offsets are commit versions), an
    interleaved OPTIMIZE is transparent (compaction re-emits NOTHING —
    only CREATE/APPEND segments are served), and the per-commit
    aggregate is value-certified against relational recomputation.
    This is the 100 TB ingest-tailing contract: downstream consumers
    ride the commit log, and a compaction storm never double-feeds
    them."""
    from ..sources.txlog_stream import register_txlog_table_source
    from ..streaming.jobs import run_to_completion

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    more = (orders
            .filter((F.col("o_orderkey") > 1000)
                    & (F.col("o_orderkey") <= 1500))
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("tstream", sf_dir), base,
                          overwrite=True)
    t.append(more)                       # v1
    t.optimize_compact(target_segments=2)  # v2: must be transparent
    register_txlog_table_source(spark)
    stream = (spark.readStream.format("txlogtable")
              .option("path", t.path).load())
    agg = (stream
           .groupBy(F.col("_commit_version").alias("commit_version"))
           .agg(F.count("*").alias("n_rows"),
                F.sum("cents").alias("total_cents"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key")))
    return (run_to_completion(agg, "complete")
            .orderBy("commit_version"))


@register(
    "delta_column_mapping",
    oracle=f"""
    WITH all_rows AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS price_cents
      FROM orders WHERE o_orderkey <= 1500
    ), updated AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN price_cents + 55 ELSE price_cents END AS price_cents
      FROM all_rows
    )
    SELECT o_orderpriority,
           COUNT(*)                         AS n_rows,
           CAST(SUM(price_cents) AS BIGINT) AS total_price_cents,
           TRUE                             AS rename_was_metadata_only
    FROM updated
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "column-mapping", "rename", "sql", "engine"),
)
def delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping (Delta's name-mapping mode): ``ALTER TABLE …
    RENAME COLUMN cents TO price_cents`` through ``Engine.sql`` touches
    NO data file (audit flag: the active file set is unchanged by the
    rename) — reads translate physical→logical on the fly, and a
    subsequent append AND a copy-on-write UPDATE both operate under the
    new logical name (their segments store the physical name, proving
    the write-side translation) — with the final state value-certified
    under the new name.  At 100 TB this is a rename costing one JSON
    commit instead of a table rewrite."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("colmap", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("txlog_orders_cm", t)
    files_before, _ = t._snapshot_files()
    engine.sql("ALTER TABLE txlog_orders_cm RENAME COLUMN cents "
               "TO price_cents")
    files_after, _ = t._snapshot_files()
    metadata_only = files_before == files_after
    t.append(orders
             .filter((F.col("o_orderkey") > 1000)
                     & (F.col("o_orderkey") <= 1500))
             .select("o_orderkey", "o_orderpriority",
                     cents.alias("price_cents")))
    engine.sql("UPDATE txlog_orders_cm SET price_cents = price_cents + 55 "
               "WHERE o_orderpriority = '1-URGENT'")
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("price_cents").alias("total_price_cents"))
        .withColumn("rename_was_metadata_only", F.lit(metadata_only))
        .orderBy("o_orderpriority")
    )


@register(
    "sql_txn_batch",
    # The oracle recomputes the post-transaction state relationally AND
    # pins the atomicity audit: exactly TWO table versions (CREATE, TXN)
    # means both DML statements landed in ONE commit; per-statement
    # commits would show n_versions = 3 and flip the hash.
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 1000
    ), updated AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey <= 300 THEN cents + 100 ELSE cents END
               AS cents
      FROM base
    ), final AS (
      SELECT * FROM updated
      WHERE NOT (o_orderpriority = '5-LOW' AND o_orderkey > 800)
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           2                          AS n_versions,
           'TXN'                      AS last_op,
           2                          AS txn_statements
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "transaction", "sql", "engine"),
)
def sql_txn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statement transaction batching (VERDICT r6 item 6): a
    ``BEGIN; UPDATE …; DELETE …; COMMIT`` script goes through
    ``Engine.sql`` as ONE command — exactly the statement-sequence shape
    the reference's replicated log carries (/root/reference/src/raft/
    node.go:16-19) — and its txlog effects land as ONE commit (one
    version) via staged actions: the DELETE reads the UPDATE's
    uncommitted effect (read-your-writes), and the log shows CREATE →
    TXN, never a per-statement commit.  The aggregate certifies the
    values; n_versions/last_op/txn_statements certify the atomicity."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("txnbatch", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("txlog_orders_txn", t)
    engine.sql(
        "BEGIN; "
        "UPDATE txlog_orders_txn SET cents = cents + 100 "
        "WHERE o_orderkey <= 300; "
        "DELETE FROM txlog_orders_txn "
        "WHERE o_orderpriority = '5-LOW' AND o_orderkey > 800; "
        "COMMIT")
    hist = t.history()
    return (engine.sql(
        "SELECT o_orderpriority, COUNT(*) AS n_rows, "
        "       SUM(cents) AS total_cents "
        "FROM txlog_orders_txn GROUP BY o_orderpriority "
        "ORDER BY o_orderpriority")
        .withColumn("n_versions", F.lit(len(hist)).cast("int"))
        .withColumn("last_op", F.lit(hist[-1]["op"]))
        .withColumn("txn_statements",
                    F.lit(int(hist[-1].get("statements", 0))).cast("int")))


@register(
    "delta_cdf_after_rename",
    # The oracle reconstructs every change class across the rename: a
    # hash match proves the per-version column-mapping translation — CDF
    # sidecars store logical-AS-OF-WRITE names ('cents' at v1,
    # 'cents_adj' at v3) while the v4 append's segments store the stable
    # physical name; serving them all under one schema with values (not
    # silent NULLs) is exactly the ADVICE r7 high fix.
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
    ), app AS (
      SELECT o_orderkey, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 520
    ), changes AS (
      SELECT 'insert' AS change_type, 0 AS commit_version,
             o_orderkey, cents FROM base
      UNION ALL
      SELECT 'update_preimage', 1, o_orderkey, cents
      FROM base WHERE o_orderkey <= 200
      UNION ALL
      SELECT 'update_postimage', 1, o_orderkey, cents + 7
      FROM base WHERE o_orderkey <= 200
      UNION ALL
      SELECT 'update_preimage', 3, o_orderkey,
             CASE WHEN o_orderkey <= 200 THEN cents + 7 ELSE cents END
      FROM base WHERE o_orderkey > 150 AND o_orderkey <= 400
      UNION ALL
      SELECT 'update_postimage', 3, o_orderkey,
             CASE WHEN o_orderkey <= 200 THEN cents + 7 ELSE cents END + 11
      FROM base WHERE o_orderkey > 150 AND o_orderkey <= 400
      UNION ALL
      SELECT 'insert', 4, o_orderkey, cents FROM app
    )
    SELECT change_type, commit_version,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           MIN(o_orderkey)            AS min_key,
           MAX(o_orderkey)            AS max_key
    FROM changes
    GROUP BY change_type, commit_version
    ORDER BY change_type, commit_version
    """,
    tags=("acid", "delta", "cdf", "column-mapping", "rename"),
)
def delta_cdf_after_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed across RENAME COLUMN (ADVICE r7, high): updates
    before AND after a metadata-only rename, plus a post-rename append,
    then one ``read_changes`` over the whole history.  CDF sidecars are
    written under the logical schema of their commit ('cents' at v1,
    'cents_adj' at v3) while data segments keep the immutable physical
    name — the reader translates each commit's rows through the mapping
    AS OF that version, so the feed serves one coherent current-name
    schema with no silent NULLs and no widened union.  The second
    update's range overlaps the first (150 < k <= 400 vs k <= 200), so
    preimage values at v3 prove v1's effect composed through the
    rename."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 500)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    extra = (orders
             .filter((F.col("o_orderkey") > 500)
                     & (F.col("o_orderkey") <= 520))
             .select("o_orderkey", "o_orderpriority",
                     cents.alias("cents_adj")))
    t = TxLogTable.create(spark, _table_dir("cdfren", sf_dir), base,
                          overwrite=True, enable_cdf=True)
    t.update_where({"cents": F.col("cents") + 7},
                   F.col("o_orderkey") <= 200)                       # v1
    t.rename_column("cents", "cents_adj")                            # v2
    t.update_where({"cents_adj": F.col("cents_adj") + 11},
                   (F.col("o_orderkey") > 150)
                   & (F.col("o_orderkey") <= 400))                   # v3
    t.append(extra)                                                  # v4
    return (
        t.read_changes(0, 4)
        .groupBy(F.col("_change_type").alias("change_type"),
                 F.col("_commit_version").alias("commit_version"))
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents_adj").alias("total_cents"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
        .orderBy("change_type", "commit_version")
    )


@register(
    "delta_reorg_purge",
    # The oracle recomputes the post-delete state; the audit columns pin
    # that the deletions were MATERIALIZED (no DV remains outstanding),
    # that the command committed as REORG, and that it was targeted
    # (some segments rewritten, the DV-free ones carried by reference).
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           0                             AS dvs_outstanding,
           'REORG'                       AS last_op,
           TRUE                          AS untouched_carried
    FROM orders
    WHERE o_orderkey <= 1000
      AND NOT (o_orderkey % 7 = 0 AND o_orderkey <= 500)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "deletion-vectors", "reorg", "purge"),
)
def delta_reorg_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG TABLE ... APPLY (PURGE): a deletion-vector DELETE leaves
    merge-on-read tombstones; PURGE rewrites ONLY the DV'd segments,
    materializing the deletions into clean files and retiring the
    sidecars — the targeted O(dv'd files) maintenance command that keeps
    a 100 TB table's read path anti-join-free without a full rewrite.
    The oracle certifies the post-purge values; the audit columns pin
    zero outstanding DVs, the REORG commit, and that at least one
    DV-free segment carried over by reference (file-level targeting)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 500)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(2, "o_orderkey"))
    extra = (orders
             .filter((F.col("o_orderkey") > 500)
                     & (F.col("o_orderkey") <= 1000))
             .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
             .repartition(2, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("reorg", sf_dir), base,
                          overwrite=True)
    t.append(extra)
    # tombstone multiples of 7 in the FIRST half only: the second
    # append's segments stay DV-free and must survive PURGE untouched
    t.delete_where((F.col("o_orderkey") % 7 == 0)
                   & (F.col("o_orderkey") <= 500), use_dv=True)
    active_before, _, dvs_before = t._snapshot_full()
    dv_free = {p for p in active_before if not dvs_before.get(p)}
    t.reorg_purge()
    active_after, _, dvs_after = t._snapshot_full()
    outstanding = sum(1 for p in active_after if dvs_after.get(p))
    carried = any(p in active_after for p in dv_free)
    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("dvs_outstanding", F.lit(outstanding).cast("int"))
            .withColumn("last_op", F.lit(t.history()[-1]["op"]))
            .withColumn("untouched_carried", F.lit(bool(carried)))
            .orderBy("o_orderpriority"))


@register(
    "delta_copy_into",
    # The oracle recomputes the final table state; the audit columns pin
    # idempotence (the re-run loaded ZERO files and minted no version)
    # and incrementality (the post-landing run loaded only the new file).
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                      AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           0                             AS rerun_files_loaded,
           TRUE                          AS rerun_was_noop,
           TRUE                          AS incremental_loaded_new_only
    FROM orders
    WHERE o_orderkey <= 1000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "copy-into", "ingest", "idempotent"),
)
def delta_copy_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY INTO — idempotent bulk file ingest (Delta's retry-safe batch
    front door): a landing directory is copied into an ACID table, the
    SAME command re-runs as a version-free no-op (each source file loads
    at most once ever — the ledger is ``txn`` actions committed WITH the
    data, so it is transactional and checkpoint-bounded), and after a
    new file lands only THAT file is ingested.  At 100 TB this replaces
    external did-I-load-it bookkeeping for scheduled ingest jobs.  The
    oracle certifies the final values; the audit columns pin the no-op
    re-run and the incremental third run."""
    from ..tmpstage import staging_dir

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    land = staging_dir("copy_into_landing", sf_dir)
    (orders.filter(F.col("o_orderkey") <= 800)
     .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
     .repartition(2, "o_orderkey")
     .write.mode("overwrite").parquet(land))
    empty = spark.createDataFrame(
        [], "o_orderkey long, o_orderpriority string, cents long")
    t = TxLogTable.create(spark, _table_dir("copyinto", sf_dir), empty,
                          overwrite=True)
    _, n1 = t.copy_into(land)
    v_after_first = t.latest_version()
    _, n2 = t.copy_into(land)                      # idempotent re-run
    rerun_noop = (n2 == 0 and t.latest_version() == v_after_first)
    (orders.filter((F.col("o_orderkey") > 800)
                   & (F.col("o_orderkey") <= 1000))
     .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
     .coalesce(1)
     .write.mode("append").parquet(land))          # one NEW file lands
    _, n3 = t.copy_into(land)
    incremental = (n1 == 2 and n3 == 1)  # 2 base files, 1 new
    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("rerun_files_loaded", F.lit(n2).cast("int"))
            .withColumn("rerun_was_noop", F.lit(bool(rerun_noop)))
            .withColumn("incremental_loaded_new_only",
                        F.lit(bool(incremental)))
            .orderBy("o_orderpriority"))


@register(
    "delta_dv_update",
    # The oracle recomputes the post-update state; the audit columns pin
    # the merge-on-read mechanics — zero original segments de-listed
    # (a copy-on-write update would rewrite them) and the row count
    # still resolvable metadata-only (stats minus tombstones plus adds).
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 10 = 0
                         THEN {_CENTS} + 5 ELSE {_CENTS} END)
                AS BIGINT)            AS total_cents,
           TRUE                       AS segments_untouched,
           'dv'                       AS update_mode,
           TRUE                       AS count_metadata_only
    FROM orders
    WHERE o_orderkey <= 1000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "deletion-vectors", "update", "merge-on-read"),
)
def delta_dv_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE via deletion vectors: the matched rows'
    positions are tombstoned and their post-images appended in ONE
    commit — NO existing segment is rewritten, so updating k rows costs
    O(k) regardless of segment size (at 100 TB, bumping one row in a
    1 GB segment stops costing a 1 GB rewrite; REORG PURGE materializes
    later).  The oracle certifies the updated values; the audit columns
    pin that every original segment survived untouched and that
    COUNT(*) still resolves metadata-only."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("dvupd", sf_dir), base,
                          overwrite=True)
    files_before = set(t._snapshot_files()[0])
    t.update_where({"cents": F.col("cents") + 5},
                   F.col("o_orderkey") % 10 == 0, use_dv=True)
    files_after = set(t._snapshot_files()[0])
    untouched = files_before <= files_after
    n, meta_only = t.count_rows()
    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("segments_untouched", F.lit(bool(untouched)))
            .withColumn("update_mode",
                        F.lit(t.history()[-1].get("mode", "cow")))
            .withColumn("count_metadata_only", F.lit(bool(meta_only)))
            .orderBy("o_orderpriority"))


@register(
    "delta_identity_columns",
    # Dense assignment is certified NUMERICALLY: min id = 1, max id =
    # distinct ids = total rows (dense ⟺ distinct == max-min+1 ==
    # count), and the second commit's lowest id continues exactly at
    # first-commit-count + 1 — all recomputable by the oracle from raw
    # orders, no engine-dependent values involved.
    oracle=f"""
    WITH n1 AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey <= 500),
         nt AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey <= 700)
    SELECT o_orderpriority,
           COUNT(*)                        AS n_rows,
           CAST(SUM({_CENTS}) AS BIGINT)   AS total_cents,
           1                               AS min_id,
           (SELECT c FROM nt)              AS max_id,
           (SELECT c FROM nt)              AS n_distinct_ids,
           (SELECT c FROM n1) + 1          AS second_batch_min_id
    FROM orders
    WHERE o_orderkey <= 700
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "identity", "generated"),
)
def delta_identity_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY columns (Delta's GENERATED ALWAYS AS IDENTITY): ids are
    engine-assigned at write — dense, monotonic, continuing from a
    commit-carried high-water mark — via zero-shuffle distributed
    assignment (per-partition contiguous ranges from broadcast offsets,
    Arrow-batched).  The oracle certifies density and cross-commit
    continuation numerically: min=1, max=distinct=row count, and the
    second append's first id lands exactly at count(first)+1."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 500)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    extra = (orders
             .filter((F.col("o_orderkey") > 500)
                     & (F.col("o_orderkey") <= 700))
             .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
             .repartition(2, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("ident", sf_dir), base,
                          overwrite=True, identity_columns={"rid": 1})
    t.append(extra)
    snap = t.read()
    stats = snap.agg(
        F.min("rid").alias("mn"), F.max("rid").alias("mx"),
        F.countDistinct("rid").alias("nd")).collect()[0]
    second_min = (snap.filter(F.col("o_orderkey") > 500)
                  .agg(F.min("rid")).collect()[0][0])
    dense_ok = (stats["mn"] == 1 and stats["mx"] == stats["nd"])
    assert dense_ok, "identity ids must be dense"
    return (snap
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("min_id", F.lit(int(stats["mn"])).cast("long"))
            .withColumn("max_id", F.lit(int(stats["mx"])).cast("long"))
            .withColumn("n_distinct_ids",
                        F.lit(int(stats["nd"])).cast("long"))
            .withColumn("second_batch_min_id",
                        F.lit(int(second_min)).cast("long"))
            .orderBy("o_orderpriority"))


@register(
    "delta_insert_overwrite",
    # The oracle recomputes the post-overwrite state; audit columns pin
    # atomic partition-scoped replacement: untouched partitions' files
    # carried by reference, and time travel to v0 still serves the full
    # original row count.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 900 AND o_orderkey % 3 <> 1
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey <= 1200 AND o_orderkey % 3 = 1
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           'OVERWRITE'                AS last_op,
           TRUE                       AS untouched_carried,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 900)
                                      AS v0_rows
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "overwrite", "partition", "replace-where"),
)
def delta_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped INSERT OVERWRITE (Delta's replaceWhere): one
    partition of a Hive-layout ACID table is atomically replaced — one
    commit de-lists exactly that partition's segments and adds the new
    data; the other partitions carry by reference and time travel to the
    pre-overwrite snapshot still works.  This is the daily-reload shape
    at 100 TB: replace one day, touch nothing else, readers never see a
    half-swapped table.  The oracle certifies the merged state; audit
    columns pin the untouched-partition carry and the v0 row count."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    bucket = (F.col("o_orderkey") % 3).cast("string")
    base = (orders.filter(F.col("o_orderkey") <= 900)
            .select(bucket.alias("bucket"), "o_orderkey",
                    "o_orderpriority", cents.alias("cents"))
            .repartition(3, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("overwrite", sf_dir), base,
                          overwrite=True, partition_by="bucket")
    active_before, _ = t._snapshot()
    other = [p for p, s in active_before.items()
             if (s or {}).get("partitionValues", {}).get("bucket") != "1"]
    replacement = (orders
                   .filter((F.col("o_orderkey") <= 1200)
                           & (F.col("o_orderkey") % 3 == 1))
                   .select(bucket.alias("bucket"), "o_orderkey",
                           "o_orderpriority", (cents + 7).alias("cents")))
    t.insert_overwrite(replacement, partitions={"bucket": "1"})
    active_after, _ = t._snapshot()
    carried = all(p in active_after for p in other)
    v0_rows = t.read(version=0).count()
    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("last_op", F.lit(t.history()[-1]["op"]))
            .withColumn("untouched_carried", F.lit(bool(carried)))
            .withColumn("v0_rows", F.lit(int(v0_rows)).cast("long"))
            .orderBy("o_orderpriority"))


@register(
    "delta_apply_changes",
    # Oracle: recompute the fold directly — highest sequence per key
    # wins; stale updates lose, winning deletes drop keys, winning
    # inserts land.  n_versions = 2 (CREATE, TXN) pins that the whole
    # out-of-order batch applied as ONE atomic commit.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey <= 200                 -- seq-2 update won
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 200 AND o_orderkey <= 400
      UNION ALL                                           -- 401-500 deleted
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 5 AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 520
      UNION ALL                                           -- re-insert won
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 520 AND o_orderkey <= 600
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 680
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           2                          AS n_versions,
           'APPLY CHANGES'            AS last_op
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "cdc", "apply-changes", "scd1"),
)
def delta_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply — the DLT ``APPLY CHANGES INTO`` shape (SCD type 1): an
    OUT-OF-ORDER change batch (stale updates sequenced before their
    winners, deletes racing re-inserts) folds into the ACID table with
    per-key highest-sequence-wins semantics, landing as ONE atomic
    single-pass commit (upserts AND deletes in one copy-on-write rewrite
    of the touched segments — a staged DELETE-then-MERGE would rewrite
    them twice).  This is what makes at-least-once
    CDC transports safe: arrival order never matters, only the sequence.
    The oracle recomputes the fold relationally; n_versions pins the
    single-commit atomicity."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 600)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("cdc", sf_dir), base,
                          overwrite=True)
    k = F.col("o_orderkey")
    src = orders.select("o_orderkey", "o_orderpriority",
                        cents.alias("cents"))

    def batch(flt, dcents, seq, ctype):
        return (src.filter(flt)
                .withColumn("cents", F.col("cents") + dcents)
                .withColumn("seq", F.lit(seq).cast("int"))
                .withColumn("_change_type", F.lit(ctype)))

    changes = (
        batch(k <= 200, 7, 2, "update_postimage")          # winner
        .unionByName(batch(k <= 200, 3, 1, "update_postimage"))  # stale
        .unionByName(batch((k > 400) & (k <= 500), 1, 1,
                           "update_postimage"))            # loses to delete
        .unionByName(batch((k > 400) & (k <= 500), 0, 2, "delete"))
        .unionByName(batch((k > 500) & (k <= 520), 0, 1, "delete"))
        .unionByName(batch((k > 500) & (k <= 520), 5, 2, "insert"))
        .unionByName(batch((k > 600) & (k <= 680), 0, 1, "insert"))
        # shuffle arrival order: the fold must not care
        .repartition(8))
    t.apply_changes(changes, key="o_orderkey", sequence_by="seq")
    hist = t.history()
    return (t.read()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("n_versions", F.lit(len(hist)).cast("int"))
            .withColumn("last_op", F.lit(hist[-1]["op"]))
            .orderBy("o_orderpriority"))


@register(
    "delta_row_tracking",
    # Row tracking is certified NUMERICALLY (engine-assigned ids are
    # partition-order-dependent, so the oracle pins the invariants, not
    # the values): initial assignment is dense 1..n (distinct == count,
    # min 1, max n), OPTIMIZE changes ZERO ids, a DV delete changes ZERO
    # surviving ids while max stays n (ids burn, never reuse), and the
    # commit count pins the exact operation sequence.
    oracle="""
    WITH nt AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey <= 600),
         ns AS (SELECT COUNT(*) AS c FROM orders
                WHERE o_orderkey > 100 AND o_orderkey <= 600)
    SELECT CAST(ns.c + 1 AS BIGINT) AS n_rows,
           CAST(ns.c + 1 AS BIGINT) AS n_ids,
           CAST(1 AS BIGINT)        AS min_id_initial,
           CAST(nt.c AS BIGINT)     AS max_id_initial,
           CAST(1 AS BIGINT)        AS append_id_past_burned,
           CAST(0 AS BIGINT)        AS changed_by_optimize,
           CAST(0 AS BIGINT)        AS changed_by_delete,
           4                        AS n_versions,
           'APPEND'                 AS last_op
    FROM nt, ns
    """,
    tags=("acid", "delta", "row-tracking"),
)
def delta_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row tracking (Delta's baseRowId feature): every row carries a
    stable engine-assigned ``_row_id`` (file baseRowId + physical
    position, allocated from a max-merged high-water mark inside the
    commit claim loop).  The query certifies the full contract: dense
    initial assignment, OPTIMIZE preserving every id through the rewrite
    (ids are materialized into the compacted segments), and a DV DELETE
    keeping all surviving ids while the burned ids never return.  At
    100 TB stable row ids are what incremental consumers key on without
    a CDF subscription — and the allocation is metadata-only (footer
    counts), never a data pass."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 600)
            .select("o_orderkey", "o_orderpriority")
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("rowtrack", sf_dir), base,
                          overwrite=True, row_tracking=True)
    ids0 = t.read_with_row_ids().select("o_orderkey", "_row_id")
    stats0 = ids0.agg(
        F.min("_row_id").alias("mn"), F.max("_row_id").alias("mx")
    ).collect()[0]
    t.optimize_compact(target_segments=2)
    ids1 = t.read_with_row_ids().select("o_orderkey", "_row_id")
    changed_opt = (ids0.withColumnRenamed("_row_id", "id0")
                   .join(ids1, "o_orderkey")
                   .filter(F.col("id0") != F.col("_row_id")).count())
    t.delete_where(k <= 100, use_dv=True)
    ids2 = t.read_with_row_ids().select("o_orderkey", "_row_id")
    changed_del = (ids1.withColumnRenamed("_row_id", "id1")
                   .join(ids2, "o_orderkey")
                   .filter(F.col("id1") != F.col("_row_id")).count())
    # burned ids never return: the next append allocates strictly PAST
    # the whole burned/assigned range (the high-water mark advances
    # monotonically, including through rewrites — Delta assigns fresh
    # baseRowIds to OPTIMIZE'd files while reads serve the materialized
    # originals), never into the freed ids
    t.append(spark.createDataFrame([(9999999, "0-PROBE")],
                                   "o_orderkey long, o_orderpriority "
                                   "string"))
    ids3 = t.read_with_row_ids()
    hist = t.history()
    return (ids3.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("_row_id").alias("n_ids"),
        (F.max(F.when(F.col("o_orderkey") == 9999999, F.col("_row_id")))
         > F.max(F.when(F.col("o_orderkey") != 9999999, F.col("_row_id")))
         ).cast("long").alias("append_id_past_burned"))
        .withColumn("min_id_initial", F.lit(int(stats0["mn"])).cast("long"))
        .withColumn("max_id_initial", F.lit(int(stats0["mx"])).cast("long"))
        .withColumn("changed_by_optimize",
                    F.lit(changed_opt).cast("long"))
        .withColumn("changed_by_delete", F.lit(changed_del).cast("long"))
        .withColumn("n_versions", F.lit(len(hist)).cast("int"))
        .withColumn("last_op", F.lit(hist[-1]["op"]))
        .select("n_rows", "n_ids", "min_id_initial", "max_id_initial",
                "append_id_past_burned", "changed_by_optimize",
                "changed_by_delete", "n_versions", "last_op"))


@register(
    "delta_apply_changes_scd2",
    # Oracle: recompute the SCD2 fold relationally — per key the batch's
    # events order by sequence, each non-delete event becomes a history
    # row ended by the NEXT event's sequence, deletes close without
    # adding, and the key's existing open row closes at the batch's
    # first sequence.  n_versions = 2 pins single-commit atomicity.
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, {_CENTS} AS cents,
             0 AS start_at, CAST(NULL AS INTEGER) AS end_at
      FROM orders WHERE o_orderkey <= 300
    ), ev AS (
      SELECT o_orderkey AS k, {_CENTS} + 10 AS cents, 1 AS seq, 'u' AS typ
      FROM orders WHERE o_orderkey <= 100
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 20, 2, 'u'
      FROM orders WHERE o_orderkey <= 100
      UNION ALL
      SELECT o_orderkey, {_CENTS}, 1, 'delete'
      FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 150
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 5, 2, 'u'
      FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 130
      UNION ALL
      SELECT o_orderkey, {_CENTS}, 1, 'u'
      FROM orders WHERE o_orderkey > 300 AND o_orderkey <= 350
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 1, 2, 'u'
      FROM orders WHERE o_orderkey > 300 AND o_orderkey <= 320
    ), seqd AS (
      SELECT k, cents, seq, typ,
             LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS nxt
      FROM ev
    ), newrows AS (
      SELECT k, cents, seq AS start_at, nxt AS end_at
      FROM seqd WHERE typ <> 'delete'
    ), firsts AS (
      SELECT k, MIN(seq) AS fs FROM ev GROUP BY k
    ), closedb AS (
      SELECT b.k, b.cents, b.start_at, f.fs AS end_at
      FROM base b JOIN firsts f ON b.k = f.k
    ), carried AS (
      SELECT b.k, b.cents, b.start_at, b.end_at
      FROM base b LEFT JOIN firsts f ON b.k = f.k WHERE f.k IS NULL
    ), final AS (
      SELECT * FROM closedb UNION ALL
      SELECT * FROM carried UNION ALL
      SELECT * FROM newrows
    )
    SELECT start_at,
           CAST(end_at IS NULL AS INTEGER) AS is_open,
           COUNT(*)                        AS n_rows,
           COUNT(DISTINCT k)               AS n_keys,
           CAST(SUM(cents) AS BIGINT)      AS total_cents,
           2                               AS n_versions,
           'APPLY CHANGES SCD2'            AS last_op
    FROM final
    GROUP BY start_at, is_open
    ORDER BY start_at, is_open
    """,
    tags=("acid", "delta", "cdc", "apply-changes", "scd2"),
)
def delta_apply_changes_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with full history tracking — the DLT ``APPLY CHANGES
    INTO … STORED AS SCD TYPE 2`` shape: an out-of-order change batch
    (two-event update chains, deletes, re-inserts, brand-new keys) folds
    into the ACID table as ONE atomic commit that KEEPS every row
    version — each non-delete event lands as a history row
    ``[__START_AT, __END_AT)``, deletes close the chain, the existing
    open row closes at the batch's first sequence, and closed history is
    immutable (only segments holding OPEN rows of batch keys are
    rewritten — the property that keeps SCD2 copy-on-write viable at
    100 TB).  The oracle recomputes the fold with window functions;
    grouping by (start, open-flag) certifies every chain edge."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 300)
            .select("o_orderkey", cents.alias("cents"))
            .withColumn("__START_AT", F.lit(0).cast("int"))
            .withColumn("__END_AT", F.lit(None).cast("int"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("scd2", sf_dir), base,
                          overwrite=True)
    src = orders.select("o_orderkey", cents.alias("cents"))

    def batch(flt, dcents, seq, ctype):
        return (src.filter(flt)
                .withColumn("cents", F.col("cents") + dcents)
                .withColumn("seq", F.lit(seq).cast("int"))
                .withColumn("_change_type", F.lit(ctype)))

    changes = (
        batch(k <= 100, 20, 2, "update_postimage")           # chain tail
        .unionByName(batch(k <= 100, 10, 1, "update_postimage"))
        .unionByName(batch((k > 100) & (k <= 150), 0, 1, "delete"))
        .unionByName(batch((k > 100) & (k <= 130), 5, 2, "insert"))
        .unionByName(batch((k > 300) & (k <= 350), 0, 1, "insert"))
        .unionByName(batch((k > 300) & (k <= 320), 1, 2,
                           "update_postimage"))
        # shuffle arrival order: the fold must not care
        .repartition(8))
    t.apply_changes_scd2(changes, key="o_orderkey", sequence_by="seq")
    hist = t.history()
    return (t.read()
            .groupBy(F.col("__START_AT").alias("start_at"),
                     F.col("__END_AT").isNull().cast("int")
                     .alias("is_open"))
            .agg(F.count("*").alias("n_rows"),
                 F.count_distinct("o_orderkey").alias("n_keys"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("n_versions", F.lit(len(hist)).cast("int"))
            .withColumn("last_op", F.lit(hist[-1]["op"]))
            .orderBy("start_at", "is_open"))


@register(
    "delta_streaming_scd2",
    # Same fold as delta_apply_changes_scd2's oracle, but the events
    # arrive through a REAL Structured Streaming query into cdc_sink
    # (foreachBatch + txn idempotence); replay_was_noop pins that a
    # re-delivered epoch commits nothing, n_versions = 2 pins that the
    # whole stream landed as ONE atomic commit.
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, {cents} AS cents,
             0 AS start_at, CAST(NULL AS INTEGER) AS end_at
      FROM orders WHERE o_orderkey <= 300
    ), ev AS (
      SELECT o_orderkey AS k, {cents} + 10 AS cents, 1 AS seq, 'u' AS typ
      FROM orders WHERE o_orderkey <= 100
      UNION ALL
      SELECT o_orderkey, {cents} + 20, 2, 'u'
      FROM orders WHERE o_orderkey <= 100
      UNION ALL
      SELECT o_orderkey, {cents}, 1, 'delete'
      FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 150
      UNION ALL
      SELECT o_orderkey, {cents} + 5, 2, 'u'
      FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 130
    ), seqd AS (
      SELECT k, cents, seq, typ,
             LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS nxt
      FROM ev
    ), newrows AS (
      SELECT k, cents, seq AS start_at, nxt AS end_at
      FROM seqd WHERE typ <> 'delete'
    ), firsts AS (
      SELECT k, MIN(seq) AS fs FROM ev GROUP BY k
    ), closedb AS (
      SELECT b.k, b.cents, b.start_at, f.fs AS end_at
      FROM base b JOIN firsts f ON b.k = f.k
    ), carried AS (
      SELECT b.k, b.cents, b.start_at, b.end_at
      FROM base b LEFT JOIN firsts f ON b.k = f.k WHERE f.k IS NULL
    ), final AS (
      SELECT * FROM closedb UNION ALL
      SELECT * FROM carried UNION ALL
      SELECT * FROM newrows
    )
    SELECT start_at,
           CAST(end_at IS NULL AS INTEGER) AS is_open,
           COUNT(*)                        AS n_rows,
           CAST(SUM(cents) AS BIGINT)      AS total_cents,
           1                               AS replay_was_noop,
           2                               AS n_versions
    FROM final
    GROUP BY start_at, is_open
    ORDER BY start_at, is_open
    """.replace("{cents}", _CENTS),
    tags=("acid", "delta", "cdc", "scd2", "streaming"),
)
def delta_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SCD2 — the DLT ``APPLY CHANGES INTO … STORED AS SCD
    TYPE 2`` pipeline end-to-end: CDC events arrive through a real
    Structured Streaming query (file source, availableNow) into
    ``cdc_sink(scd_type=2)``, which folds each micro-batch with full
    history tracking and records the epoch id as an idempotent ``txn``
    action.  A deliberately REPLAYED epoch commits nothing
    (``replay_was_noop`` audit flag — without idempotence the replay
    would REFUSE on its own frontier and a restarted stream would
    crash-loop), and the whole event set lands as ONE atomic commit
    (n_versions).  The oracle recomputes every chain edge with window
    functions — the streaming transport must be value-invisible."""
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 300)
            .select("o_orderkey", cents.alias("cents"))
            .withColumn("__START_AT", F.lit(0).cast("int"))
            .withColumn("__END_AT", F.lit(None).cast("int"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("scd2stream", sf_dir), base,
                          overwrite=True)
    src = orders.select("o_orderkey", cents.alias("cents"))

    def batch(flt, dcents, seq, ctype):
        return (src.filter(flt)
                .withColumn("cents", F.col("cents") + dcents)
                .withColumn("seq", F.lit(seq).cast("int"))
                .withColumn("_change_type", F.lit(ctype)))

    changes = (
        batch(k <= 100, 10, 1, "update_postimage")
        .unionByName(batch(k <= 100, 20, 2, "update_postimage"))
        .unionByName(batch((k > 100) & (k <= 150), 0, 1, "delete"))
        .unionByName(batch((k > 100) & (k <= 130), 5, 2, "insert"))
        .repartition(4))
    events_dir = _table_dir("scd2events", sf_dir)
    changes.write.mode("overwrite").parquet(events_dir)
    ck = _table_dir("scd2ck", sf_dir)
    shutil.rmtree(ck, ignore_errors=True)
    sink = t.cdc_sink("scd2_stream", "o_orderkey", "seq", scd_type=2)
    stream = spark.readStream.schema(changes.schema).parquet(events_dir)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    v_before = t.latest_version()
    sink(spark.read.parquet(events_dir), 0)  # replayed epoch 0
    replay_noop = t.latest_version() == v_before
    return (t.read()
            .groupBy(F.col("__START_AT").alias("start_at"),
                     F.col("__END_AT").isNull().cast("int")
                     .alias("is_open"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("replay_was_noop",
                        F.lit(replay_noop).cast("int"))
            .withColumn("n_versions",
                        F.lit(t.latest_version() + 1).cast("int"))
            .orderBy("start_at", "is_open"))


@register(
    "delta_merge_schema_evolution",
    # The oracle recomputes the post-merge state INCLUDING the evolved
    # column: pre-evolution rows read typed NULL (COUNT(bonus) excludes
    # them), updated + inserted rows materialize values — a hash match
    # certifies the same-commit schema change, the NULL backfill on old
    # segments, and both star arms binding the new column.
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents,
             CAST(NULL AS BIGINT) AS bonus
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents,
             o_orderkey % 5 AS bonus
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500
    )
    SELECT o_orderpriority,
           COUNT(*)                    AS n_rows,
           CAST(SUM(cents) AS BIGINT)  AS total_cents,
           COUNT(bonus)                AS n_with_bonus,
           CAST(SUM(bonus) AS BIGINT)  AS total_bonus,
           FALSE                       AS pre_merge_had_column
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "merge", "schema-evolution", "sql", "engine"),
)
def delta_merge_schema_evolution(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """MERGE WITH SCHEMA EVOLUTION (Delta's automatic merge evolution):
    a source column absent from the target evolves the schema in the
    SAME commit as the merge — appended nullable through exactly
    append's evolution path (same retired/vacated-name guards).
    Updated and inserted rows materialize the new column; every
    pre-evolution row — including rows in segments the merge never
    touched — reads typed NULL; time travel to before the merge lacks
    the column entirely (pinned by the audit flag).

    At 100 TB this is the CDC-source-adds-a-column event: the pipeline
    keeps flowing with a metadata-only schema change instead of a
    blocking backfill."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 1000)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    t = TxLogTable.create(spark, _table_dir("mergevo", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("mse_orders", t)
    pre_cols = set(t.read().columns)
    (orders.filter((F.col("o_orderkey") > 500)
                   & (F.col("o_orderkey") <= 1500))
     .select("o_orderkey", "o_orderpriority", (cents + 7).alias("cents"),
             (F.col("o_orderkey") % 5).cast("long").alias("bonus"))
     .createOrReplaceTempView("mse_src"))
    v = engine.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO mse_orders AS t "
        "USING mse_src AS s ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *").collect()[0]["version"]
    had_before = ("bonus" in pre_cols
                  or "bonus" in t.read(version=v - 1).columns)
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"),
             F.sum("cents").alias("total_cents"),
             F.count("bonus").alias("n_with_bonus"),
             F.sum("bonus").alias("total_bonus"))
        .withColumn("pre_merge_had_column", F.lit(bool(had_before)))
        .orderBy("o_orderpriority")
    )


@register(
    "delta_merge_full_identity",
    # Identity composition with the three-arm MERGE, certified
    # NUMERICALLY like delta_identity_columns: ids stay dense across
    # the statement (min=1, max=distinct=row count), every FIRST-batch
    # row — updated or carried — keeps a first-batch id (max id over
    # keys <= 500 equals count(<=500)), and the insert arm continues
    # exactly at count(<=500)+1.
    oracle=f"""
    WITH n1 AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey <= 500),
         nt AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey <= 900),
         final AS (
      SELECT o_orderkey, o_orderpriority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 400
      UNION ALL
      SELECT o_orderkey, o_orderpriority, {_CENTS} + 7 AS cents
      FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 900
    )
    SELECT o_orderpriority,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           1                          AS min_id,
           (SELECT c FROM nt)         AS max_id,
           (SELECT c FROM nt)         AS n_distinct_ids,
           (SELECT c FROM n1)         AS first_batch_max_id,
           (SELECT c FROM n1) + 1     AS insert_arm_min_id
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("acid", "delta", "identity", "merge"),
)
def delta_merge_full_identity(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Full-clause MERGE composed with GENERATED BY DEFAULT identity:
    the update arm keeps each matched row's engine-assigned id (SET *
    never overwrites identity), the insert arm's absent id slots are
    engine-assigned continuing past the commit-carried high-water mark
    — dense, collision-free, zero extra shuffle (per-partition ranges
    from broadcast offsets; the partition binding rides a materialized
    column so the union with the rewrite arm cannot shift it)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (orders.filter(F.col("o_orderkey") <= 500)
            .select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    src = (orders
           .filter((F.col("o_orderkey") > 400)
                   & (F.col("o_orderkey") <= 900))
           .select("o_orderkey", "o_orderpriority",
                   (cents + 7).alias("cents"))
           .repartition(3, "o_orderkey"))
    t = TxLogTable.create(
        spark, _table_dir("mfident", sf_dir), base, overwrite=True,
        identity_columns={"rid": {"start": 1, "step": 1, "always": False}})
    t.merge_full(
        src, "o_orderkey",
        when_matched=[{"action": "update", "set": "*"}],
        when_not_matched=[{"action": "insert", "values": "*"}])
    snap = t.read()
    stats = snap.agg(
        F.min("rid").alias("mn"), F.max("rid").alias("mx"),
        F.countDistinct("rid").alias("nd"),
        F.max(F.when(F.col("o_orderkey") <= 500, F.col("rid")))
        .alias("b1mx"),
        F.min(F.when(F.col("o_orderkey") > 500, F.col("rid")))
        .alias("insmn")).collect()[0]
    assert stats["mn"] == 1 and stats["mx"] == stats["nd"], \
        "identity ids must stay dense across the merge"
    return (snap
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("min_id", F.lit(int(stats["mn"])).cast("long"))
            .withColumn("max_id", F.lit(int(stats["mx"])).cast("long"))
            .withColumn("n_distinct_ids",
                        F.lit(int(stats["nd"])).cast("long"))
            .withColumn("first_batch_max_id",
                        F.lit(int(stats["b1mx"])).cast("long"))
            .withColumn("insert_arm_min_id",
                        F.lit(int(stats["insmn"])).cast("long"))
            .orderBy("o_orderpriority"))


@register(
    "delta_scd2_backfill",
    # The DuckDB oracle folds the ENTIRE event set in sequence order
    # with one window pass — the defining contract of sequenced
    # backfill: applying {seq 10, 30} first and splicing {seq 20,
    # delete 40} later must equal the in-order fold.  Full spliced
    # chains are returned row-by-row, so the hash certifies every
    # moved end bound, every spliced row, and every delete closure.
    oracle=f"""
    WITH ev AS (
      SELECT o_orderkey AS k, {_CENTS} AS cents, 10 AS seq, FALSE AS del
      FROM orders WHERE o_orderkey <= 300
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 5, 30, FALSE
      FROM orders WHERE o_orderkey <= 300 AND o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, {_CENTS} + 2, 20, FALSE
      FROM orders WHERE o_orderkey <= 300 AND o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS BIGINT), 40, TRUE
      FROM orders WHERE o_orderkey <= 300 AND o_orderkey % 7 = 0
    ), folded AS (
      SELECT k, cents, seq AS start_at,
             LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS end_at,
             del
      FROM ev
    )
    SELECT k, cents, start_at, end_at
    FROM folded WHERE NOT del
    ORDER BY k, start_at
    """,
    tags=("acid", "delta", "cdc", "scd2", "backfill"),
)
def delta_scd2_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced SCD2 late-history backfill (DLT's backfill shape):
    settled history is immutable by default, but ``allow_backfill=True``
    splices a below-frontier batch by re-folding each affected key's
    full reconstructed event timeline — rewriting only the segments
    holding those keys' chains.  Here {seq 10, seq 30} apply first,
    then a LATE batch {seq 20 upserts, seq 40 deletes} splices in; the
    oracle folds all events in order at once, so a hash match proves
    splice-equals-in-order-arrival for every chain edge."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    keys = orders.filter(F.col("o_orderkey") <= 300)
    empty = spark.createDataFrame(
        [], "k bigint, cents bigint, __START_AT int, __END_AT int")
    t = TxLogTable.create(spark, _table_dir("scd2bf", sf_dir), empty,
                          overwrite=True)
    ev1 = (keys.select(F.col("o_orderkey").alias("k"),
                       cents.alias("cents"),
                       F.lit(10).alias("seq"),
                       F.lit("insert").alias("_change_type"))
           .unionByName(
               keys.filter(F.col("o_orderkey") % 3 == 0)
               .select(F.col("o_orderkey").alias("k"),
                       (cents + 5).alias("cents"),
                       F.lit(30).alias("seq"),
                       F.lit("update_postimage").alias("_change_type"))))
    t.apply_changes_scd2(ev1, key="k", sequence_by="seq")
    late = (keys.filter(F.col("o_orderkey") % 5 == 0)
            .select(F.col("o_orderkey").alias("k"),
                    (cents + 2).alias("cents"),
                    F.lit(20).alias("seq"),
                    F.lit("update_postimage").alias("_change_type"))
            .unionByName(
                keys.filter(F.col("o_orderkey") % 7 == 0)
                .select(F.col("o_orderkey").alias("k"),
                        F.lit(None).cast("bigint").alias("cents"),
                        F.lit(40).alias("seq"),
                        F.lit("delete").alias("_change_type"))))
    t.apply_changes_scd2(late, key="k", sequence_by="seq",
                         allow_backfill=True)
    return (t.read()
            .select("k", "cents",
                    F.col("__START_AT").alias("start_at"),
                    F.col("__END_AT").alias("end_at"))
            .orderBy("k", "start_at"))


@register(
    "delta_materialized_view_rollup",
    # Full-recompute oracle over the mutated source — the hash certifies
    # that a COMPUTED group key (the time-bucketed rollup shape) buckets
    # identically in the initial scan, the CDF folds (delete + append),
    # and the MIN/MAX bounded repair (the delete removes month maxima).
    oracle=f"""
    WITH fin AS (
      SELECT o_orderdate, {_CENTS} AS cents
      FROM orders
      WHERE (o_orderkey <= 1000 AND o_orderkey % 5 <> 0)
         OR (o_orderkey > 1000 AND o_orderkey <= 1300)
    )
    SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT)
               AS ym,
           COUNT(*)                          AS n_orders,
           CAST(SUM(cents) AS BIGINT)        AS total_cents,
           CAST(MAX(cents) AS BIGINT)        AS max_cents,
           TRUE                              AS fold_at_source_head
    FROM fin
    GROUP BY ym
    ORDER BY ym
    """,
    tags=("acid", "delta", "mv", "cdf", "rollup", "incremental", "sql",
          "engine"),
)
def delta_materialized_view_rollup(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Time-bucketed MATERIALIZED VIEW rollup — the hypertable
    continuous-aggregate shape: the MV groups by a COMPUTED key
    (``YEAR(d) * 100 + MONTH(d) AS ym``), evaluated on the row source
    so the initial scan, every CDF fold, and the MIN/MAX repair
    recompute bucket identically; maintenance stays ∝ change volume.
    A modulo delete (drops month maxima → bounded repair) and an
    append (new months are born) fold in one refresh; the oracle
    recomputes the rollup from scratch."""
    from ..engine import Engine

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 1000)
            .select("o_orderkey", "o_orderdate", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    import os
    import shutil
    src_path = _table_dir("mvrollsrc", sf_dir)
    shutil.rmtree(os.path.join(
        os.path.dirname(os.path.abspath(src_path)), "mvrollview"),
        ignore_errors=True)
    src = TxLogTable.create(spark, src_path, base, overwrite=True,
                            enable_cdf=True)
    engine = Engine(spark, sf_dir)
    engine.register_txlog("mvrollsrc", src)
    engine.sql(
        "CREATE MATERIALIZED VIEW mvrollview AS "
        "SELECT YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS ym, "
        "COUNT(*) AS n_orders, SUM(cents) AS total_cents, "
        "MAX(cents) AS max_cents FROM mvrollsrc GROUP BY ym")
    src.delete_where(k % 5 == 0)
    src.append(orders.filter((k > 1000) & (k <= 1300))
               .select("o_orderkey", "o_orderdate", cents.alias("cents"))
               .repartition(4, "o_orderkey"))
    engine.sql("REFRESH MATERIALIZED VIEW mvrollview")
    mv = engine.txlog_tables["mvrollview"]
    at_head = mv.txn_version_for("mv::mvrollview") == src.latest_version()
    return (engine._public_view(mv.read())
            .withColumn("ym", F.col("ym").cast("bigint"))
            .withColumn("fold_at_source_head", F.lit(bool(at_head)))
            .orderBy("ym"))


@register(
    "delta_scd2_track_history_except",
    # The oracle recomputes the run-collapsed fold relationally: events
    # (seed open rows at seq 0 + the batch) mark a run boundary on
    # first-event / delete-adjacent / tracked-column-change, collapse
    # per (key, run) — start = first seq, excluded column = LAST seq's
    # value (arg_max) — then chain ends with LEAD.  Full chains are
    # returned row-by-row, so the hash certifies every absorbed
    # excluded-only refresh, every real version boundary, and every
    # delete closure.
    oracle=f"""
    WITH seed AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri, {_CENTS} AS c0
      FROM orders WHERE o_orderkey <= 300
    ), ev AS (
      SELECT k, 0 AS seq, pri, c0 AS cents, FALSE AS del FROM seed
      UNION ALL
      SELECT k, 1, pri, c0 + 11, FALSE FROM seed WHERE k <= 200
      UNION ALL
      SELECT k, 2, 'Z-SPECIAL', c0 + 20, FALSE FROM seed WHERE k % 3 = 0
      UNION ALL
      SELECT k, 3, 'Z-SPECIAL', c0 + 77, FALSE FROM seed WHERE k % 9 = 0
      UNION ALL
      SELECT k, 4, NULL, NULL, TRUE FROM seed WHERE k % 7 = 0
    ), m AS (
      SELECT *, CASE WHEN lag(seq) OVER w IS NULL THEN 1
                     WHEN del OR lag(del) OVER w THEN 1
                     WHEN pri IS DISTINCT FROM lag(pri) OVER w THEN 1
                     ELSE 0 END AS nr
      FROM ev WINDOW w AS (PARTITION BY k ORDER BY seq)
    ), runs AS (
      SELECT k, run, MIN(seq) AS start_at, BOOL_OR(del) AS del,
             MAX(pri) AS pri, arg_max(cents, seq) AS cents
      FROM (SELECT *, SUM(nr) OVER (PARTITION BY k ORDER BY seq) AS run
            FROM m)
      GROUP BY k, run
    ), folded AS (
      SELECT k, pri, cents, start_at,
             LEAD(start_at) OVER (PARTITION BY k ORDER BY start_at)
                 AS end_at,
             del
      FROM runs
    )
    SELECT k, pri, CAST(cents AS BIGINT) AS cents, start_at, end_at
    FROM folded WHERE NOT del
    ORDER BY k, start_at
    """,
    tags=("acid", "delta", "cdc", "scd2", "track-history-except"),
)
def delta_scd2_track_history_except(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """DLT's ``TRACK HISTORY ON * EXCEPT (cols)``: churn confined to
    EXCLUDED columns never opens a new SCD2 version — here ``cents`` is
    excluded, ``o_orderpriority`` tracked.  A cents-only refresh (seq 1)
    is ABSORBED into each key's open row (same start, latest cents, no
    new version), a priority change (seq 2) opens a version, a further
    cents refresh on the new version (seq 3) absorbs again, and deletes
    (seq 4) close chains regardless of exclusions.  The whole batch
    folds in ONE commit; only segments holding open rows of batch keys
    rewrite.  The oracle recomputes the run-collapsed fold with window
    functions — full chains hash-certified."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    seed = (orders.filter(k <= 300)
            .select(k.alias("k"), F.col("o_orderpriority").alias("pri"),
                    cents.alias("cents"))
            .withColumn("__START_AT", F.lit(0).cast("int"))
            .withColumn("__END_AT", F.lit(None).cast("int"))
            .repartition(4, "k"))
    t = TxLogTable.create(spark, _table_dir("scd2te", sf_dir), seed,
                          overwrite=True)
    src = orders.filter(k <= 300).select(
        k.alias("k"), F.col("o_orderpriority").alias("pri"),
        cents.alias("cents"))

    def ev(flt, pri_col, dc, seq, ct):
        return (src.filter(flt)
                .withColumn("pri", pri_col)
                .withColumn("cents", F.col("cents") + dc)
                .withColumn("seq", F.lit(seq).cast("int"))
                .withColumn("_change_type", F.lit(ct)))

    batch = (
        ev(F.col("k") <= 200, F.col("pri"), 11, 1, "update_postimage")
        .unionByName(ev(F.col("k") % 3 == 0, F.lit("Z-SPECIAL"), 20, 2,
                        "update_postimage"))
        .unionByName(ev(F.col("k") % 9 == 0, F.lit("Z-SPECIAL"), 77, 3,
                        "update_postimage"))
        .unionByName(
            src.filter(F.col("k") % 7 == 0)
            .select("k", F.lit(None).cast("string").alias("pri"),
                    F.lit(None).cast("bigint").alias("cents"),
                    F.lit(4).cast("int").alias("seq"),
                    F.lit("delete").alias("_change_type")))
        .repartition(8))  # arrival order must not matter
    t.apply_changes_scd2(batch, key="k", sequence_by="seq",
                         track_history_except_columns=["cents"])
    return (t.read()
            .select("k", "pri", "cents",
                    F.col("__START_AT").alias("start_at"),
                    F.col("__END_AT").alias("end_at"))
            .orderBy("k", "start_at"))


@register(
    "delta_merge_composite_key",
    # Composite-key MERGE certified value-exactly: the oracle recomputes
    # the post-merge state from raw lineitem on the natural two-column
    # PK (l_orderkey, l_linenumber) — a hash match proves matching
    # resolves on the PAIR (rows sharing only one key column are
    # distinct keys), through the SQL route's AND-joined ON clause.
    # the synthetic lineitem does not enforce the PK, so both sides
    # reduce to one row per pair first (MIN per column — deterministic)
    oracle="""
    WITH final AS (
      SELECT l_orderkey, l_linenumber,
             MIN(CAST(l_quantity AS BIGINT)) AS qty,
             MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS cents
      FROM lineitem WHERE l_orderkey <= 300
      GROUP BY l_orderkey, l_linenumber
      UNION ALL
      SELECT l_orderkey, l_linenumber,
             MIN(CAST(l_quantity AS BIGINT)) + 1,
             MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) + 7
      FROM lineitem WHERE l_orderkey > 300 AND l_orderkey <= 900
      GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_linenumber,
           COUNT(*)                   AS n_rows,
           CAST(SUM(qty) AS BIGINT)   AS total_qty,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM final
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
    tags=("acid", "delta", "merge", "composite-key", "sql", "engine"),
)
def delta_merge_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE on a COMPOSITE key — TPC-H lineitem's natural two-column
    primary key (l_orderkey, l_linenumber), the shape real CDC feeds
    have.  The ON clause carries AND-joined equalities; matching
    resolves on the full pair (one shared column is NOT a match), the
    commit records per-column keyRanges for concurrent-writer conflict
    detection, and copy-on-write still rewrites only segments holding a
    matched pair."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)) \
        .cast("bigint")
    qty = F.col("l_quantity").cast("long")
    # the synthetic lineitem does not enforce the PK: reduce to one row
    # per (l_orderkey, l_linenumber) deterministically (MIN per column)
    base = (li.filter(F.col("l_orderkey") <= 600)
            .groupBy("l_orderkey", "l_linenumber")
            .agg(F.min(qty).alias("qty"), F.min(cents).alias("cents"))
            .repartition(4, "l_orderkey"))
    t = TxLogTable.create(spark, _table_dir("mergeck", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("ck_lineitem", t)
    (li.filter((F.col("l_orderkey") > 300) & (F.col("l_orderkey") <= 900))
     .groupBy("l_orderkey", "l_linenumber")
     .agg((F.min(qty) + 1).alias("qty"),
          (F.min(cents) + 7).alias("cents"))
     .createOrReplaceTempView("ck_src"))
    engine.sql(
        "MERGE INTO ck_lineitem AS t USING ck_src AS s "
        "ON t.l_orderkey = s.l_orderkey "
        "AND t.l_linenumber = s.l_linenumber "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *")
    return (t.read()
            .groupBy("l_linenumber")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("qty").alias("total_qty"),
                 F.sum("cents").alias("total_cents"))
            .orderBy("l_linenumber"))


@register(
    "delta_apply_changes_snapshot",
    # Oracle (two independent certificates): the final SCD1 state must
    # equal the LAST snapshot exactly (per-priority rollup), and the
    # v2 change feed must contain exactly one delete per dropped key,
    # one pre+post pair per CHANGED key, one insert per born key — and
    # NOTHING for identical rows (the diff must not derive spurious
    # events: at 100 TB a spurious per-key update is a full rewrite).
    oracle=f"""
    WITH s2 AS (
      SELECT o_orderkey AS k, o_orderpriority AS priority,
             {_CENTS} + CASE WHEN o_orderkey % 3 = 0 THEN 3 ELSE 0 END
                 AS cents
      FROM orders WHERE o_orderkey <= 1200 AND o_orderkey % 5 <> 0
    ), counts AS (
      SELECT
        (SELECT COUNT(*) FROM orders
         WHERE o_orderkey <= 1000 AND o_orderkey % 5 = 0)
            AS n_deletes,
        (SELECT COUNT(*) FROM orders
         WHERE o_orderkey <= 1000 AND o_orderkey % 5 <> 0
           AND o_orderkey % 3 = 0)
            AS n_updates,
        (SELECT COUNT(*) FROM orders
         WHERE o_orderkey > 1000 AND o_orderkey <= 1200
           AND o_orderkey % 5 <> 0)
            AS n_inserts
    )
    SELECT priority,
           COUNT(*)                    AS n_rows,
           CAST(SUM(cents) AS BIGINT)  AS total_cents,
           MIN(k)                      AS min_key,
           MAX(k)                      AS max_key,
           CAST(c.n_deletes AS BIGINT) AS cdf_deletes,
           CAST(c.n_updates AS BIGINT) AS cdf_update_pairs,
           CAST(c.n_inserts AS BIGINT) AS cdf_inserts
    FROM s2, counts c
    GROUP BY priority, c.n_deletes, c.n_updates, c.n_inserts
    ORDER BY priority
    """,
    tags=("acid", "delta", "cdc", "apply-changes", "snapshot", "scd1",
          "sql", "engine"),
)
def delta_apply_changes_snapshot(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``APPLY CHANGES FROM SNAPSHOT`` — the second DLT CDC ingestion
    mode (``create_auto_cdc_from_snapshot``): the source delivers
    sequenced FULL snapshots, not a change feed; the engine diffs each
    snapshot against the target's current state to DERIVE the
    insert/update/delete events (absence = delete) and folds them
    through the SCD1 machinery in one atomic commit.  S1 = orders keys
    <= 1000; S2 drops every 5th key, bumps cents on every 3rd, births
    (1000, 1200] — and leaves the rest IDENTICAL, which must derive NO
    events (certified through the CDF row counts: deletes=1 row,
    changed keys=pre+post pair, births=1 insert, identical=nothing)."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    s1 = (orders.filter(k <= 1000)
          .select("o_orderkey", F.col("o_orderpriority").alias("priority"),
                  cents.alias("cents")))
    s2 = (orders.filter((k <= 1200) & (k % 5 != 0))
          .select("o_orderkey", F.col("o_orderpriority").alias("priority"),
                  (cents + F.when(k % 3 == 0, 3).otherwise(0))
                  .alias("cents")))
    t = TxLogTable.create(spark, _table_dir("snapcdc", sf_dir),
                          s1.limit(0), overwrite=True, enable_cdf=True)
    engine.register_txlog("snapcdc", t)
    t.apply_changes_from_snapshot(s1, key="o_orderkey", snapshot_version=1)
    v_pre = t.latest_version()
    # the statement route drives the second snapshot
    s2.createOrReplaceTempView("snapcdc_s2")
    engine.sql("APPLY CHANGES INTO snapcdc FROM SNAPSHOT snapcdc_s2 "
               "VERSION 2 KEYS (o_orderkey)")
    ch = t.read_changes(v_pre + 1, t.latest_version())
    ev = ch.agg(
        F.sum((F.col("_change_type") == "delete").cast("long"))
        .alias("cdf_deletes"),
        (F.sum((F.col("_change_type") == "update_postimage").cast("long")))
        .alias("cdf_update_pairs"),
        F.sum((F.col("_change_type") == "insert").cast("long"))
        .alias("cdf_inserts")).collect()[0]
    return (t.read()
            .groupBy("priority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key"))
            .withColumn("cdf_deletes",
                        F.lit(int(ev["cdf_deletes"])).cast("long"))
            .withColumn("cdf_update_pairs",
                        F.lit(int(ev["cdf_update_pairs"])).cast("long"))
            .withColumn("cdf_inserts",
                        F.lit(int(ev["cdf_inserts"])).cast("long"))
            .orderBy("priority"))


@register(
    "delta_apply_changes_snapshot_scd2",
    # Oracle: reconstruct the full SCD2 history from the snapshot
    # SEQUENCE alone with a gaps-and-islands pass — per key, presence
    # and value across the version grid split into runs; each present
    # run is a history row [run start, next run start).  A hash match
    # certifies every derived insert/update/delete landed at the right
    # version, identical rows opened no spurious versions, and absent
    # keys closed exactly at the snapshot that dropped them.
    oracle=f"""
    WITH s1 AS (
      SELECT o_orderkey AS k, {_CENTS} AS c, 10 AS v
      FROM orders WHERE o_orderkey <= 300
    ), s2 AS (
      SELECT o_orderkey,
             {_CENTS} + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END,
             20
      FROM orders WHERE o_orderkey <= 300 AND o_orderkey % 7 <> 0
    ), s3 AS (
      SELECT o_orderkey,
             {_CENTS} + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END,
             30
      FROM orders WHERE o_orderkey <= 330 AND o_orderkey % 5 <> 0
    ), snaps AS (
      SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
      SELECT * FROM s3
    ), grid AS (
      SELECT kk.k, vv.v
      FROM (SELECT DISTINCT k FROM snaps) kk
      CROSS JOIN (VALUES (10), (20), (30)) AS vv(v)
    ), state AS (
      SELECT g.k, g.v, s.c, s.k IS NOT NULL AS present
      FROM grid g LEFT JOIN snaps s ON g.k = s.k AND g.v = s.v
    ), marked AS (
      SELECT k, v, c, present,
             CASE WHEN LAG(present) OVER w IS NULL
                       AND NOT present THEN 0
                  WHEN LAG(present) OVER w IS NULL THEN 1
                  WHEN present <> LAG(present) OVER w THEN 1
                  WHEN present AND c IS DISTINCT FROM LAG(c) OVER w
                       THEN 1
                  ELSE 0 END AS brk
      FROM state WINDOW w AS (PARTITION BY k ORDER BY v)
    ), runs AS (
      SELECT k, v, c, present,
             SUM(brk) OVER (PARTITION BY k ORDER BY v) AS run
      FROM marked
    ), rowsq AS (
      SELECT k, run, MIN(v) AS start_at, MAX(c) AS c,
             BOOL_OR(present) AS present
      FROM runs WHERE run > 0 GROUP BY k, run
    ), hist AS (
      SELECT k, c, start_at,
             LEAD(start_at) OVER (PARTITION BY k ORDER BY start_at)
                 AS end_at,
             present
      FROM rowsq
    )
    SELECT k, CAST(c AS BIGINT) AS cents,
           CAST(start_at AS INTEGER) AS start_at,
           CAST(end_at AS INTEGER)   AS end_at
    FROM hist WHERE present
    ORDER BY k, start_at
    """,
    tags=("acid", "delta", "cdc", "apply-changes", "snapshot", "scd2"),
)
def delta_apply_changes_snapshot_scd2(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """``APPLY CHANGES FROM SNAPSHOT … STORED AS SCD TYPE 2``: three
    sequenced full snapshots fold into complete history — S2 deletes
    every 7th key and changes every 3rd; S3 re-births the deleted keys
    that survive its own %5 drop (a key can leave and RETURN — two
    history rows) and births (300, 330].  Unchanged keys must never
    open spurious versions (S2→S3 value-identical keys keep one open
    row).  The full chain set is returned row-by-row; the oracle
    reconstructs it from the snapshot sequence with a gaps-and-islands
    window pass, so the hash certifies every chain edge at every
    version."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    bump = (cents + F.when(k % 3 == 0, 2).otherwise(0)).alias("cents")
    s1 = orders.filter(k <= 300).select(F.col("o_orderkey").alias("k"),
                                        cents.alias("cents"))
    s2 = (orders.filter((k <= 300) & (k % 7 != 0))
          .select(F.col("o_orderkey").alias("k"), bump))
    s3 = (orders.filter((k <= 330) & (k % 5 != 0))
          .select(F.col("o_orderkey").alias("k"), bump))
    empty = spark.createDataFrame(
        [], "k bigint, cents bigint, __START_AT int, __END_AT int")
    t = TxLogTable.create(spark, _table_dir("snapscd2", sf_dir), empty,
                          overwrite=True)
    for ver, snap in ((10, s1), (20, s2), (30, s3)):
        t.apply_changes_from_snapshot(snap, key="k", snapshot_version=ver,
                                      scd_type=2)
    return (t.read()
            .select("k", "cents",
                    F.col("__START_AT").alias("start_at"),
                    F.col("__END_AT").alias("end_at"))
            .orderBy("k", "start_at"))


@register(
    "delta_streaming_snapshot_cdc",
    # Same gaps-and-islands reconstruction as
    # delta_apply_changes_snapshot_scd2's oracle, but the snapshots
    # arrive through a REAL Structured Streaming query into
    # snapshot_sink (foreachBatch, one COMPLETE snapshot per
    # micro-batch, batch_id = snapshot version); replay_was_noop pins
    # that a re-delivered current epoch commits nothing and
    # stale_was_refused that an OLD epoch is refused with nothing
    # committed (the txn-marker exactly-once + monotonicity contracts
    # a restarted stream depends on), and n_fold_commits = 3 pins one
    # atomic commit per snapshot.
    oracle=f"""
    WITH s1 AS (
      SELECT o_orderkey AS k, {_CENTS} AS c, 0 AS v
      FROM orders WHERE o_orderkey <= 300
    ), s2 AS (
      SELECT o_orderkey,
             {_CENTS} + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END,
             1
      FROM orders WHERE o_orderkey <= 300 AND o_orderkey % 7 <> 0
    ), s3 AS (
      SELECT o_orderkey,
             {_CENTS} + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END,
             2
      FROM orders WHERE o_orderkey <= 330 AND o_orderkey % 5 <> 0
    ), snaps AS (
      SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
      SELECT * FROM s3
    ), grid AS (
      SELECT kk.k, vv.v
      FROM (SELECT DISTINCT k FROM snaps) kk
      CROSS JOIN (VALUES (0), (1), (2)) AS vv(v)
    ), state AS (
      SELECT g.k, g.v, s.c, s.k IS NOT NULL AS present
      FROM grid g LEFT JOIN snaps s ON g.k = s.k AND g.v = s.v
    ), marked AS (
      SELECT k, v, c, present,
             CASE WHEN LAG(present) OVER w IS NULL
                       AND NOT present THEN 0
                  WHEN LAG(present) OVER w IS NULL THEN 1
                  WHEN present <> LAG(present) OVER w THEN 1
                  WHEN present AND c IS DISTINCT FROM LAG(c) OVER w
                       THEN 1
                  ELSE 0 END AS brk
      FROM state WINDOW w AS (PARTITION BY k ORDER BY v)
    ), runs AS (
      SELECT k, v, c, present,
             SUM(brk) OVER (PARTITION BY k ORDER BY v) AS run
      FROM marked
    ), rowsq AS (
      SELECT k, run, MIN(v) AS start_at, MAX(c) AS c,
             BOOL_OR(present) AS present
      FROM runs WHERE run > 0 GROUP BY k, run
    ), hist AS (
      SELECT k, c, start_at,
             LEAD(start_at) OVER (PARTITION BY k ORDER BY start_at)
                 AS end_at,
             present
      FROM rowsq
    )
    SELECT k, CAST(c AS BIGINT) AS cents,
           CAST(start_at AS INTEGER) AS start_at,
           CAST(end_at AS INTEGER)   AS end_at,
           1 AS replay_was_noop,
           1 AS stale_was_refused,
           3 AS n_fold_commits
    FROM hist WHERE present
    ORDER BY k, start_at
    """,
    tags=("acid", "delta", "cdc", "apply-changes", "snapshot", "scd2",
          "streaming"),
)
def delta_streaming_snapshot_cdc(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """STREAMING snapshot-mode CDC end-to-end (r12 — certifies
    ``snapshot_sink`` the way ``delta_streaming_scd2`` certifies
    ``cdc_sink``): three sequenced FULL snapshots land as one parquet
    file each and arrive through a REAL Structured Streaming file
    source (``maxFilesPerTrigger=1`` + availableNow → one snapshot per
    micro-batch, deterministic batch_id = snapshot version); the sink
    diffs each against current state and folds SCD TYPE 2 history in
    one atomic commit per snapshot.  A REPLAYED last epoch commits
    nothing (txn-marker idempotence — a restarted stream re-delivers
    its last micro-batch) and a re-delivered STALE epoch is REFUSED
    loudly with nothing committed (snapshots fold monotonically —
    folding backwards would silently rewrite derived history).  The
    oracle reconstructs the full history from the snapshot sequence
    alone — the streaming transport must be value-invisible."""
    import glob as _glob
    import os
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    bump = (cents + F.when(k % 3 == 0, 2).otherwise(0)).alias("cents")
    s1 = orders.filter(k <= 300).select(F.col("o_orderkey").alias("k"),
                                        cents.alias("cents"))
    s2 = (orders.filter((k <= 300) & (k % 7 != 0))
          .select(F.col("o_orderkey").alias("k"), bump))
    s3 = (orders.filter((k <= 330) & (k % 5 != 0))
          .select(F.col("o_orderkey").alias("k"), bump))
    empty = spark.createDataFrame(
        [], "k bigint, cents bigint, __START_AT int, __END_AT int")
    t = TxLogTable.create(spark, _table_dir("snapstream", sf_dir), empty,
                          overwrite=True)
    # one parquet FILE per snapshot with strictly increasing mtimes —
    # the file source processes them oldest-first, one per micro-batch
    stream_dir = _table_dir("snapstream_src", sf_dir)
    shutil.rmtree(stream_dir, ignore_errors=True)
    os.makedirs(stream_dir)
    for i, snap in enumerate((s1, s2, s3)):
        tmp = os.path.join(stream_dir, f"_stage_{i}")
        snap.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(stream_dir, f"snap_{i:05d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_000_000_000 + 60 * i, 1_000_000_000 + 60 * i))
    ck = _table_dir("snapstream_ck", sf_dir)
    shutil.rmtree(ck, ignore_errors=True)
    v0 = t.latest_version()
    sink = t.snapshot_sink("snap_stream", key="k", scd_type=2)
    stream = (spark.readStream.schema(s1.schema)
              .option("maxFilesPerTrigger", 1).parquet(stream_dir))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    n_fold_commits = t.latest_version() - v0
    v_before = t.latest_version()
    last = spark.read.parquet(os.path.join(stream_dir,
                                           "snap_00002.parquet"))
    sink(last, 2)  # restarted stream re-delivers its last epoch
    replay_noop = t.latest_version() == v_before
    stale = spark.read.parquet(os.path.join(stream_dir,
                                            "snap_00000.parquet"))
    try:  # an OLD epoch below the watermark is REFUSED loudly
        sink(stale, 0)
        stale_refused = False
    except ValueError:
        stale_refused = t.latest_version() == v_before
    return (t.read()
            .select("k", "cents",
                    F.col("__START_AT").alias("start_at"),
                    F.col("__END_AT").alias("end_at"))
            .withColumn("replay_was_noop", F.lit(replay_noop).cast("int"))
            .withColumn("stale_was_refused",
                        F.lit(stale_refused).cast("int"))
            .withColumn("n_fold_commits",
                        F.lit(n_fold_commits).cast("int"))
            .orderBy("k", "start_at"))


@register(
    "delta_multi_flow_ingestion",
    # Oracle: ground-truth recompute of the two flows' final state —
    # the CDC flow's last-writer-wins fold (epoch 2 bumps %3 keys,
    # epoch 1 bumps %2 keys, else the epoch-0 value) and the append
    # flow's three slices exactly once despite every epoch being
    # delivered twice.  The audit flags certify both per-flow txn
    # watermarks and the per-flow commit counts (5 ingest commits
    # would mean a replay landed twice; 2 would mean one was lost).
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey AS k,
             {_CENTS} + CASE WHEN o_orderkey % 3 = 0 THEN 20
                             WHEN o_orderkey % 2 = 0 THEN 10
                             ELSE 0 END AS cents,
             'cdc' AS src
      FROM orders WHERE o_orderkey <= 300
    ), b AS (
      SELECT o_orderkey + 10000 AS k, {_CENTS} AS cents,
             'append' AS src
      FROM orders WHERE o_orderkey <= 300
    ), fin AS (
      SELECT * FROM a UNION ALL SELECT * FROM b
    )
    SELECT src,
           COUNT(*)                   AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           2 AS wm_flow_cdc,
           2 AS wm_flow_append,
           3 AS commits_flow_cdc,
           3 AS commits_flow_append
    FROM fin
    GROUP BY src
    ORDER BY src
    """,
    tags=("acid", "delta", "cdc", "streaming", "multi-flow", "occ"),
)
def delta_multi_flow_ingestion(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """MULTI-FLOW ingestion into ONE target (r12 — DLT's several-flows-
    one-table shape): a CDC flow (``cdc_sink``, SCD1 fold) and an
    append flow (``streaming_sink``) write the same table CONCURRENTLY
    from two threads through separate handles, three epochs each, every
    epoch delivered TWICE (at-least-once transport) with a barrier
    racing the flows into OCC interleavings.  Each flow's distinct
    ``txn_app_id`` keeps its own replay watermark, so replays no-op
    per flow and the commits compose: appends carry no key range and
    the fold rewrites only segments holding its own keys, so the
    writers commute instead of conflicting — the shape that lets N
    pipelines feed one 100 TB table without a coordinator."""
    import threading

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    keys = orders.filter(k <= 300)
    empty = spark.createDataFrame([], "k bigint, cents bigint, src string")
    t = TxLogTable.create(spark, _table_dir("multiflow", sf_dir), empty,
                          overwrite=True)
    ta = TxLogTable(spark, t.path)
    tb = TxLogTable(spark, t.path)
    sink_a = ta.cdc_sink("flow_cdc", key="k", sequence_by="seq")
    sink_b = tb.streaming_sink("flow_append")

    def mk_a(e: int) -> DataFrame:
        flt = {0: k <= 300, 1: k % 2 == 0, 2: k % 3 == 0}[e]
        return (keys.filter(flt)
                .select(F.col("o_orderkey").alias("k"),
                        (cents + 10 * e).alias("cents"),
                        F.lit("cdc").alias("src"),
                        F.lit(e).cast("int").alias("seq"),
                        F.lit("u").alias("_change_type")))

    def mk_b(e: int) -> DataFrame:
        lo, hi = 100 * e, 100 * (e + 1)
        # slice 0 is lower-inclusive: the testdata's key space starts
        # at 0, and the three slices must cover [0, 300] exactly once
        flt = (k <= hi) if e == 0 else ((k > lo) & (k <= hi))
        return (keys.filter(flt)
                .select((F.col("o_orderkey") + 10000).alias("k"),
                        cents.alias("cents"),
                        F.lit("append").alias("src")))

    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def drive(sink, mk):
        try:
            for e in range(3):
                barrier.wait(timeout=300)
                batch = mk(e)
                sink(batch, e)
                sink(batch, e)   # at-least-once redelivery
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    th_a = threading.Thread(target=drive, args=(sink_a, mk_a))
    th_b = threading.Thread(target=drive, args=(sink_b, mk_b))
    th_a.start(), th_b.start()
    th_a.join(600), th_b.join(600)
    if errs:
        raise errs[0]
    ops = [h["op"] for h in t.history()]
    return (t.read()
            .groupBy("src")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("wm_flow_cdc",
                        F.lit(ta.txn_version_for("flow_cdc")).cast("int"))
            .withColumn("wm_flow_append",
                        F.lit(tb.txn_version_for("flow_append"))
                        .cast("int"))
            .withColumn("commits_flow_cdc",
                        F.lit(ops.count("APPLY CHANGES")).cast("int"))
            .withColumn("commits_flow_append",
                        F.lit(ops.count("APPEND")).cast("int"))
            .orderBy("src"))


@register(
    "delta_scd2_ignore_null_updates",
    # Oracle: the generic resolution recomputed relationally — seed the
    # inheritance with the open row (ord 0), epoch = running delete
    # count (a delete's payload is masked, so its epoch starts empty),
    # LAST_VALUE(... IGNORE NULLS) per (key, epoch) resolves each
    # event's payload, then the standard SCD2 fold (LEAD per key) lays
    # out the history rows.  Full chains returned row-by-row.
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, {_CENTS} AS c
      FROM orders WHERE o_orderkey <= 200
    ), ev AS (
      SELECT k, CAST(NULL AS BIGINT) AS c, 1 AS seq, FALSE AS del
      FROM base
      UNION ALL
      SELECT k, NULL, 2, TRUE FROM base WHERE k % 5 = 0
      UNION ALL
      SELECT k, NULL, 3, FALSE FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT k, c + 9, 4, FALSE FROM base WHERE k % 4 = 0
    ), all_ev AS (
      SELECT k, c, 0 AS seq, FALSE AS del, 0 AS ord FROM base
      UNION ALL
      SELECT k, c, seq, del, 1 FROM ev
    ), epoch AS (
      SELECT *, SUM(CASE WHEN del THEN 1 ELSE 0 END)
                  OVER (PARTITION BY k ORDER BY ord, seq
                        ROWS UNBOUNDED PRECEDING) AS ep
      FROM all_ev
    ), resolved AS (
      SELECT k, seq, del, ord,
             LAST_VALUE(c IGNORE NULLS)
               OVER (PARTITION BY k, ep ORDER BY ord, seq
                     ROWS UNBOUNDED PRECEDING) AS c
      FROM epoch
    ), folded AS (
      SELECT k, c, seq AS start_at,
             LEAD(seq) OVER (PARTITION BY k ORDER BY ord, seq) AS end_at,
             del
      FROM resolved
    )
    SELECT k, CAST(c AS BIGINT) AS cents,
           CAST(start_at AS INTEGER) AS start_at,
           CAST(end_at AS INTEGER)   AS end_at
    FROM folded WHERE NOT del
    ORDER BY k, start_at
    """,
    tags=("acid", "delta", "cdc", "scd2", "ignore-nulls", "sql",
          "engine"),
)
def delta_scd2_ignore_null_updates(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """IGNORE NULL UPDATES composed with SCD TYPE 2 (r11 — the v1
    refusal removed): NULL event columns inherit the value AT the
    event's sequence — seeded by the key's open row, reset by a delete
    — so every opened history version carries the resolved payload.
    Events: an all-NULL update (every version [1,·) inherits the base
    cents), a %5 delete (resets inheritance), a %3 NULL update
    (post-delete keys resolve to NULL, everyone else re-inherits), and
    a %4 explicit bump.  Driven through the APPLY CHANGES statement
    with IGNORE NULL UPDATES + STORED AS SCD TYPE 2; the oracle
    recomputes resolution + fold with IGNORE NULLS windows."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 200)
            .select(F.col("o_orderkey").alias("k"), cents.alias("cents"))
            .withColumn("__START_AT", F.lit(0).cast("int"))
            .withColumn("__END_AT", F.lit(None).cast("int")))
    t = TxLogTable.create(spark, _table_dir("scd2innul", sf_dir), base,
                          overwrite=True)
    engine.register_txlog("scd2innul", t)
    kk = F.col("o_orderkey").alias("k")
    nullc = F.lit(None).cast("bigint").alias("cents")

    def ev(flt, c, seq, ct):
        return (orders.filter(flt)
                .select(kk, c, F.lit(seq).cast("int").alias("seq"),
                        F.lit(ct).alias("_change_type")))

    batch = (ev(k <= 200, nullc, 1, "u")
             .unionByName(ev((k <= 200) & (k % 5 == 0), nullc, 2,
                             "delete"))
             .unionByName(ev((k <= 200) & (k % 3 == 0), nullc, 3, "u"))
             .unionByName(ev((k <= 200) & (k % 4 == 0),
                             (cents + 9).alias("cents"), 4, "u"))
             .repartition(8))
    batch.createOrReplaceTempView("scd2innul_src")
    engine.sql("APPLY CHANGES INTO scd2innul FROM scd2innul_src KEYS (k) "
               "IGNORE NULL UPDATES SEQUENCE BY seq STORED AS SCD TYPE 2")
    return (t.read()
            .select("k", "cents",
                    F.col("__START_AT").alias("start_at"),
                    F.col("__END_AT").alias("end_at"))
            .orderBy("k", "start_at"))


@register(
    "delta_scd2_ignore_nulls_backfill",
    # Oracle: the in-order inheritance-resolve-then-fold over ALL
    # events at once (seed ord 0 = the base rows, epoch = running
    # delete count, LAST_VALUE IGNORE NULLS per (key, epoch), LEAD
    # fold) — the defining contract of the r12 composition: applying
    # the in-order batch {4, 6, 8} first and splicing the late batch
    # {5, 7, 9} after must equal folding everything in sequence order.
    # Exact because the in-order batch carries only explicit payloads
    # (recorded == raw); full chains return row-by-row, so the hash
    # certifies every spliced inheritance, the across-splice NULL
    # resolution, and the post-delete epoch reset.
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, {_CENTS} AS c
      FROM orders WHERE o_orderkey <= 150
    ), ev AS (
      SELECT k, c + 100 AS c, 4 AS seq, FALSE AS del
      FROM base WHERE k % 2 = 0
      UNION ALL
      SELECT k, NULL, 6, FALSE FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT k, NULL, 8, TRUE FROM base WHERE k % 5 = 0
      UNION ALL
      SELECT k, NULL, 5, FALSE FROM base WHERE k % 4 = 0
      UNION ALL
      SELECT k, c + 7, 7, FALSE FROM base WHERE k % 7 = 0
      UNION ALL
      SELECT k, NULL, 9, FALSE FROM base WHERE k % 10 = 0
    ), all_ev AS (
      SELECT k, c, 0 AS seq, FALSE AS del, 0 AS ord FROM base
      UNION ALL
      SELECT k, c, seq, del, 1 FROM ev
    ), epoch AS (
      SELECT *, SUM(CASE WHEN del THEN 1 ELSE 0 END)
                  OVER (PARTITION BY k ORDER BY ord, seq
                        ROWS UNBOUNDED PRECEDING) AS ep
      FROM all_ev
    ), resolved AS (
      SELECT k, seq, del, ord,
             LAST_VALUE(c IGNORE NULLS)
               OVER (PARTITION BY k, ep ORDER BY ord, seq
                     ROWS UNBOUNDED PRECEDING) AS c
      FROM epoch
    ), folded AS (
      SELECT k, c, seq AS start_at,
             LEAD(seq) OVER (PARTITION BY k ORDER BY ord, seq) AS end_at,
             del
      FROM resolved
    )
    SELECT k, CAST(c AS BIGINT) AS cents,
           CAST(start_at AS INTEGER) AS start_at,
           CAST(end_at AS INTEGER)   AS end_at
    FROM folded WHERE NOT del
    ORDER BY k, start_at
    """,
    tags=("acid", "delta", "cdc", "scd2", "ignore-nulls", "backfill"),
)
def delta_scd2_ignore_nulls_backfill(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """IGNORE NULL UPDATES × sequenced backfill (r12 — the last CDC
    composition refusal removed): the NULL-inheritance chain rides the
    splice re-fold.  The in-order batch applies explicit bumps (seq 4),
    NULL inherits (seq 6), and deletes (seq 8); the LATE batch then
    splices a below-frontier NULL slot (seq 5 — inherits the seq-4
    value ACROSS the splice), an explicit mid-chain bump (seq 7), and a
    post-delete NULL upsert (seq 9 — the reconstructed delete resets
    the chain, so it inherits NOTHING).  The oracle resolves + folds
    all events in sequence order at once; a hash match proves
    splice-with-inherit ≡ in-order-with-inherit for every chain."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    keys = orders.filter(k <= 150)
    base = (keys.select(F.col("o_orderkey").alias("k"),
                        cents.alias("cents"))
            .withColumn("__START_AT", F.lit(0).cast("int"))
            .withColumn("__END_AT", F.lit(None).cast("int")))
    t = TxLogTable.create(spark, _table_dir("scd2inbf", sf_dir), base,
                          overwrite=True)
    kk = F.col("o_orderkey").alias("k")
    nullc = F.lit(None).cast("bigint").alias("cents")

    def ev(flt, c, seq, ct):
        return (keys.filter(flt)
                .select(kk, c, F.lit(seq).cast("int").alias("seq"),
                        F.lit(ct).alias("_change_type")))

    b1 = (ev(k % 2 == 0, (cents + 100).alias("cents"), 4, "u")
          .unionByName(ev(k % 3 == 0, nullc, 6, "u"))
          .unionByName(ev(k % 5 == 0, nullc, 8, "delete"))
          .repartition(8))
    t.apply_changes_scd2(b1, key="k", sequence_by="seq",
                         ignore_null_updates=True)
    late = (ev(k % 4 == 0, nullc, 5, "u")
            .unionByName(ev(k % 7 == 0, (cents + 7).alias("cents"), 7,
                            "u"))
            .unionByName(ev(k % 10 == 0, nullc, 9, "u"))
            .repartition(8))
    t.apply_changes_scd2(late, key="k", sequence_by="seq",
                         ignore_null_updates=True, allow_backfill=True)
    return (t.read()
            .select("k", "cents",
                    F.col("__START_AT").alias("start_at"),
                    F.col("__END_AT").alias("end_at"))
            .orderBy("k", "start_at"))


@register(
    "delta_materialized_view_approx_distinct",
    # Oracle: exact recompute of the final state with the tolerance
    # flag TRUE — Spark emits the flag from its ACTUAL maintained HLL
    # estimate vs the exact distinct count (default lgConfigK=12 →
    # ~1.6% relative error, far inside the 5% gate), so a hash match
    # proves the sketch state stayed within tolerance through the
    # insert-union fold AND the delete-triggered bounded repair.
    oracle=f"""
    WITH fin AS (
      SELECT o_orderpriority AS grp, o_custkey, {_CENTS} AS cents
      FROM orders
      WHERE (o_orderkey <= 1000 AND o_orderkey % 4 <> 0)
         OR (o_orderkey > 1000 AND o_orderkey <= 1400)
    )
    SELECT grp,
           COUNT(*)                   AS n_orders,
           COUNT(DISTINCT o_custkey)  AS nd_exact,
           TRUE                       AS hll_within_5pct
    FROM fin
    GROUP BY grp
    ORDER BY grp
    """,
    tags=("acid", "delta", "mv", "cdf", "sketch", "hll", "approx",
          "incremental", "sql", "engine"),
)
def delta_materialized_view_approx_distinct(spark: SparkSession,
                                            sf_dir: str) -> DataFrame:
    """APPROX_COUNT_DISTINCT as an incrementally-maintained MV item
    (r11): the estimate rides a hidden mergeable HLL sketch column —
    inserts UNION into the sketch (exact register arithmetic, no
    rescan), removals trigger the same bounded per-group repair as
    MIN/MAX (sketches cannot subtract).  The scenario folds an append
    (new distinct customers union in) and a modulo delete (retires
    distinct customers → repair recomputes affected groups only); the
    oracle recomputes exact counts and the within-5% flag certifies
    the maintained estimates."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    base = (orders.filter(k <= 1000)
            .select("o_orderkey", F.col("o_orderpriority").alias("grp"),
                    "o_custkey", cents.alias("cents"))
            .repartition(4, "o_orderkey"))
    import os
    import shutil
    src_path = _table_dir("mvhllsrc", sf_dir)
    shutil.rmtree(os.path.join(
        os.path.dirname(os.path.abspath(src_path)), "mvhllview"),
        ignore_errors=True)
    src = TxLogTable.create(spark, src_path, base, overwrite=True,
                            enable_cdf=True)
    engine.register_txlog("mvhllsrc", src)
    engine.sql("CREATE MATERIALIZED VIEW mvhllview AS "
               "SELECT grp, COUNT(*) AS n_orders, "
               "APPROX_COUNT_DISTINCT(o_custkey) AS nd "
               "FROM mvhllsrc GROUP BY grp")
    # append: new customers union into the sketches (insert-only fold)
    src.append(orders.filter((k > 1000) & (k <= 1400))
               .select("o_orderkey", F.col("o_orderpriority").alias("grp"),
                       "o_custkey", cents.alias("cents")))
    # delete: retires distinct customers → bounded per-group repair
    src.delete_where((k <= 1000) & (k % 4 == 0))
    engine.sql("REFRESH MATERIALIZED VIEW mvhllview")
    exact = (src.read().groupBy("grp")
             .agg(F.count_distinct("o_custkey").alias("nd_exact")))
    mv = engine.txlog_tables["mvhllview"]
    within = (F.abs(F.col("nd") - F.col("nd_exact"))
              <= 0.05 * F.col("nd_exact"))
    return (mv.read().select("grp", "n_orders", "nd")
            .join(exact, "grp")
            .select("grp", "n_orders", "nd_exact",
                    within.alias("hll_within_5pct"))
            .orderBy("grp"))


@register(
    "delta_materialized_view_dim_change",
    # Oracle: full recompute over the FINAL fact and dim states.  The
    # scenario interleaves fact churn (incremental folds) with a dim
    # UPDATE between refreshes — the engine must detect the dim's
    # version moved past the MV's recorded marker and auto-run the FULL
    # repair, then return to incremental folding; a hash match over the
    # per-region rollup certifies the repair caught the re-segmented
    # keys AND the post-repair incremental fold stayed correct.
    oracle=f"""
    WITH fact AS (
      SELECT o_orderkey AS k, o_custkey % 5 AS dk, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey <= 1000 OR
            (o_orderkey > 1200 AND o_orderkey <= 1500)
    ), dim AS (
      SELECT 0 AS dk, 'r0' AS region UNION ALL
      SELECT 1, 'r1' UNION ALL
      SELECT 2, 'r9' UNION ALL   -- re-segmented between refreshes
      SELECT 3, 'r3' UNION ALL
      SELECT 4, 'r4'
    )
    SELECT region,
           COUNT(*)                   AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM fact JOIN dim ON fact.dk = dim.dk
    GROUP BY region
    ORDER BY region
    """,
    tags=("acid", "delta", "mv", "cdf", "star-join", "dim-change",
          "incremental", "sql", "engine"),
)
def delta_materialized_view_dim_change(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Star-join MV over a CHANGING txlog dimension (r11 — the static-
    views-only refusal removed): the dim's committed version rides the
    MV as a marker; REFRESH compares it to the dim's latest_version
    (metadata-only) and auto-runs the FULL repair path exactly when the
    dim churned, while fact-only churn keeps folding incrementally from
    the CDF.  Scenario: initial fill → fact append (incremental) → dim
    UPDATE re-segments dk=2 (auto repair) → another fact append
    (incremental again, marker advanced).  The oracle recomputes from
    the final states."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    fact_rows = lambda flt: (orders.filter(flt).select(  # noqa: E731
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 5).alias("dk"),
        cents.alias("cents")))
    import os
    import shutil
    src_path = _table_dir("mvdimfact", sf_dir)
    for leftover in ("mvdimview",):
        shutil.rmtree(os.path.join(
            os.path.dirname(os.path.abspath(src_path)), leftover),
            ignore_errors=True)
    fact = TxLogTable.create(spark, src_path,
                             fact_rows(k <= 1000).repartition(4, "k"),
                             overwrite=True, enable_cdf=True)
    dim = TxLogTable.create(
        spark, _table_dir("mvdimdim", sf_dir),
        spark.createDataFrame([(i, f"r{i}") for i in range(5)],
                              "dk bigint, region string"),
        overwrite=True)
    engine.register_txlog("mvdimfact", fact)
    engine.register_txlog("mvdimdim", dim)
    engine.sql("CREATE MATERIALIZED VIEW mvdimview AS "
               "SELECT region, COUNT(*) AS n_orders, "
               "SUM(cents) AS total_cents "
               "FROM mvdimfact JOIN mvdimdim "
               "ON mvdimfact.dk = mvdimdim.dk GROUP BY region")
    # fact churn, dim clean: incremental fold
    fact.append(fact_rows((k > 1200) & (k <= 1400)))
    engine.sql("REFRESH MATERIALIZED VIEW mvdimview")
    # dim churn between refreshes: r2 → r9 (auto FULL repair)
    dim.update_where({"region": F.lit("r9")}, F.col("dk") == 2)
    engine.sql("REFRESH MATERIALIZED VIEW mvdimview")
    # post-repair fact churn: incremental again (marker advanced)
    fact.append(fact_rows((k > 1400) & (k <= 1500)))
    engine.sql("REFRESH MATERIALIZED VIEW mvdimview")
    mv = engine.txlog_tables["mvdimview"]
    return (mv.read().select("region", "n_orders", "total_cents")
            .orderBy("region"))


@register(
    "delta_expectations_quality_gate",
    # Oracle: recompute the final state (base ∪ the gated append, minus
    # the rows the DROP expectation filtered) and the per-commit
    # pass/fail metrics from the raw table — a hash match certifies
    # that exactly the violating rows were dropped, warn rows were KEPT
    # but counted, and the recorded metrics equal ground truth.
    oracle=f"""
    WITH batch AS (
      SELECT o_orderkey AS k, o_orderpriority AS priority,
             {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000
    ), fin AS (
      SELECT o_orderkey AS k, o_orderpriority AS priority, {_CENTS} AS cents
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT k, priority, cents FROM batch WHERE k % 7 <> 0
    ), m AS (
      SELECT
        (SELECT COUNT(*) FROM batch WHERE k % 7 = 0) AS drop_failed,
        (SELECT COUNT(*) FROM batch WHERE k % 5 = 0) AS warn_failed,
        (SELECT COUNT(*) FROM batch) AS batch_rows
    )
    SELECT priority,
           COUNT(*)                      AS n_rows,
           CAST(SUM(cents) AS BIGINT)    AS total_cents,
           CAST(m.drop_failed AS BIGINT) AS drop_failed,
           CAST(m.batch_rows - m.drop_failed AS BIGINT) AS drop_passed,
           CAST(m.warn_failed AS BIGINT) AS warn_failed,
           CAST(1 AS INTEGER)            AS fail_update_aborted
    FROM fin, m
    GROUP BY priority, m.drop_failed, m.warn_failed, m.batch_rows
    ORDER BY priority
    """,
    tags=("acid", "delta", "expectations", "data-quality", "sql",
          "engine"),
)
def delta_expectations_quality_gate(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """DLT expectations (r11): data-quality gates attached to the table
    (`ALTER TABLE … ADD CONSTRAINT n EXPECT (pred) [ON VIOLATION DROP
    ROW | FAIL UPDATE]`) gate every ingest and record pass/fail metrics
    in the commit info — the DLT event-log quality contract.  One
    aggregate job serves every expectation per ingest.  Scenario: a
    DROP expectation filters every 7th key of the append, a WARN
    expectation counts (but keeps) every 5th, and a FAIL UPDATE
    expectation added afterwards ABORTS a violating append with
    nothing committed (certified by the audit flag)."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    rows = lambda flt: (orders.filter(flt)  # noqa: E731
                        .select(F.col("o_orderkey").alias("k"),
                                F.col("o_orderpriority").alias("priority"),
                                cents.alias("cents")))
    t = TxLogTable.create(spark, _table_dir("expect", sf_dir),
                          rows(k <= 500), overwrite=True)
    engine.register_txlog("expgate", t)
    engine.sql("ALTER TABLE expgate ADD CONSTRAINT no_sevens "
               "EXPECT (k % 7 <> 0) ON VIOLATION DROP ROW")
    engine.sql("ALTER TABLE expgate ADD CONSTRAINT warn_fives "
               "EXPECT (k % 5 <> 0)")
    t.append(rows((k > 500) & (k <= 1000)))
    m = t.history()[-1]["expectations"]
    # FAIL UPDATE: a violating ingest aborts, nothing commits
    engine.sql("ALTER TABLE expgate ADD CONSTRAINT no_big_keys "
               "EXPECT (k <= 100000) ON VIOLATION FAIL UPDATE")
    v_before = t.latest_version()
    try:
        # shift guarantees violations at ANY scale factor
        t.append(rows(k <= 100).withColumn(
            "k", F.col("k") + F.lit(200000)))
        aborted = 0
    except ValueError:
        aborted = int(t.latest_version() == v_before)
    return (t.read()
            .groupBy("priority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .withColumn("drop_failed",
                        F.lit(int(m["no_sevens"]["failed"])).cast("long"))
            .withColumn("drop_passed",
                        F.lit(int(m["no_sevens"]["passed"])).cast("long"))
            .withColumn("warn_failed",
                        F.lit(int(m["warn_fives"]["failed"])).cast("long"))
            .withColumn("fail_update_aborted",
                        F.lit(aborted).cast("int"))
            .orderBy("priority"))


@register(
    "delta_expectations_event_log",
    # Oracle: ground-truth recompute of the per-expectation CUMULATIVE
    # metrics across both gated commits (DLT's data-quality dashboard
    # aggregates) plus the final table state — a hash match certifies
    # that SHOW EXPECTATION METRICS serves exactly the recorded
    # per-commit counts, that both ingests were gated by both
    # expectations, and that the DROP gate's filtering matches its own
    # recorded numbers.
    oracle=f"""
    WITH b1 AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN -{_CENTS}
                  ELSE {_CENTS} END AS cents
      FROM orders WHERE o_orderkey <= 500
    ), b2 AS (
      SELECT o_orderkey AS k, {_CENTS} AS cents
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1400
    ), written AS (
      SELECT * FROM b1
      UNION ALL
      SELECT * FROM b2 WHERE k <= 1200
    ), fin AS (
      SELECT COUNT(*) AS final_rows,
             CAST(SUM(cents) AS BIGINT) AS final_cents
      FROM written
    ), m AS (
      SELECT 'cents_pos' AS name, 'warn' AS action,
             2 AS n_commits,
             (SELECT COUNT(*) FROM b1 WHERE cents > 0)
               + (SELECT COUNT(*) FROM b2) AS total_passed,
             (SELECT COUNT(*) FROM b1 WHERE cents <= 0) AS total_failed
      UNION ALL
      SELECT 'key_in_range', 'drop', 2,
             (SELECT COUNT(*) FROM b1)
               + (SELECT COUNT(*) FROM b2 WHERE k <= 1200),
             (SELECT COUNT(*) FROM b2 WHERE k > 1200)
    )
    SELECT m.name, m.action,
           CAST(m.n_commits AS BIGINT) AS n_commits,
           CAST(m.total_passed AS BIGINT) AS total_passed,
           CAST(m.total_failed AS BIGINT) AS total_failed,
           fin.final_rows, fin.final_cents
    FROM m, fin
    ORDER BY m.name
    """,
    tags=("acid", "delta", "expectations", "data-quality", "event-log",
          "sql", "engine"),
)
def delta_expectations_event_log(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Expectations SURFACING (r12): ``SHOW EXPECTATIONS t`` lists the
    declared gates and ``SHOW EXPECTATION METRICS t`` serves the
    recorded per-commit pass/fail counts as a queryable event log (one
    row per commit × expectation, metadata-scale — DLT's data-quality
    dashboard shape).  Two appends flow through a WARN gate (negative
    cents on every 7th key of batch 1 — counted, kept) and a DROP gate
    (batch 2 keys beyond 1200 — filtered); the query aggregates the
    event log per expectation and joins the declared action from SHOW
    EXPECTATIONS, with final table state certifying the drops."""
    from ..engine import Engine

    engine = Engine(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    k = F.col("o_orderkey")
    empty = spark.createDataFrame([], "k bigint, cents bigint")
    t = TxLogTable.create(spark, _table_dir("expevt", sf_dir), empty,
                          overwrite=True)
    engine.register_txlog("expevt", t)
    engine.sql("ALTER TABLE expevt ADD CONSTRAINT cents_pos "
               "EXPECT (cents > 0)")
    engine.sql("ALTER TABLE expevt ADD CONSTRAINT key_in_range "
               "EXPECT (k <= 1200) ON VIOLATION DROP ROW")
    b1 = (orders.filter(k <= 500)
          .select(F.col("o_orderkey").alias("k"),
                  (F.when(k % 7 == 0, -cents).otherwise(cents))
                  .alias("cents")))
    b2 = (orders.filter((k > 500) & (k <= 1400))
          .select(F.col("o_orderkey").alias("k"), cents.alias("cents")))
    t.append(b1)
    t.append(b2)
    met = engine.sql("SHOW EXPECTATION METRICS expevt")
    decl = engine.sql("SHOW EXPECTATIONS expevt").select("name", "action")
    fin = t.read().agg(F.count("*").alias("final_rows"),
                       F.sum("cents").alias("final_cents")).collect()[0]
    return (met.groupBy("name")
            .agg(F.count("*").alias("n_commits"),
                 F.sum("passed").alias("total_passed"),
                 F.sum("failed").alias("total_failed"))
            .join(F.broadcast(decl), "name")
            .select("name", "action", "n_commits",
                    "total_passed", "total_failed")
            .withColumn("final_rows",
                        F.lit(int(fin["final_rows"])).cast("long"))
            .withColumn("final_cents",
                        F.lit(int(fin["final_cents"])).cast("long"))
            .orderBy("name"))
