"""Delta-style transaction-log table format, implemented natively on
parquet + a JSON commit log (SURVEY.md §1.3: the ACID "durability twin" of
the reference's replicated command log, /root/reference/src/raft/
replication.go:88-103 — there the log IS the database; here the log is the
table's source of truth and parquet files are immutable segments).

The delta-spark jars are not in this image (and installs are out of
scope), so this module re-implements the PUBLIC Delta Lake log protocol
shape (an ordered log of add/remove file actions; snapshot = replay;
time travel = replay a prefix) directly over the DataFrame API:

- ``create`` / ``append``   — write immutable parquet segments, commit an
  ordered JSON entry listing the files added.
- ``merge_upsert``          — copy-on-write MERGE: only the segments that
  actually contain matched keys are rewritten (file pruning via a
  semi-join on ``input_file_name``); untouched segments carry over by
  reference.  Merge cost scales with the touched fraction, not the table.
- ``read(version=...)``     — snapshot isolation + time travel: replaying
  commits ``0..v`` yields exactly the files live at version ``v``;
  readers never see a half-committed write because the commit file is
  fully written + fsync'd to a temp name and published with ``os.link``
  (atomic put-if-absent of COMPLETE content).
- ``history``               — the commit log as a DataFrame.

Commit concurrency is optimistic: the next version number is claimed by
exclusive-create of ``_txlog/{version:08d}.json``; a loser re-reads the
log and retries (classic OCC, same as Delta's LogStore contract).  On a
single POSIX fs the exclusive create is atomic; on an object store this
maps to a put-if-absent primitive.

At 100 TB: segments are immutable parquet (scan parallelism = file
count), the log is O(commits) tiny JSON, snapshot resolution is
driver-side metadata only, and MERGE rewrites only matched segments —
the same shape that makes real Delta viable at scale.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_txlog"


class TxLogTable:
    """Handle to a transaction-log table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)

    # -- log plumbing -------------------------------------------------------

    def _commit_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.log_dir, "[0-9]*.json")))

    def latest_version(self) -> int:
        files = self._commit_files()
        if not files:
            return -1
        return int(os.path.splitext(os.path.basename(files[-1]))[0])

    def _read_commit(self, version: int) -> list[dict]:
        fp = os.path.join(self.log_dir, f"{version:08d}.json")
        with open(fp) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _try_commit(self, version: int, actions: list[dict]) -> bool:
        """Atomically claim ``version`` (put-if-absent).  False = lost the
        race; caller re-reads the log and retries against the new state.

        CONTENT atomicity, not just name claim: the actions are fully
        written (and fsync'd) to a uniquely-named temp file first, then
        published with os.link — which fails if the version exists and
        otherwise makes the complete file visible in one step.  A reader
        can never observe a torn commit; a writer killed mid-write leaves
        only an invisible .tmp."""
        os.makedirs(self.log_dir, exist_ok=True)
        fp = os.path.join(self.log_dir, f"{version:08d}.json")
        tmp = os.path.join(self.log_dir,
                           f".tmp-{version:08d}-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, fp)
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        return True

    def _commit_with_occ(self, actions: list[dict], removed: list[str],
                         base_version: int) -> int:
        """Commit actions computed against the snapshot at
        ``base_version``.  If anything committed after that snapshot
        (claim target > base_version + 1, or a claim race is lost),
        verify no concurrent commit removed one of OUR files — if one
        did, the actions are stale and blindly committing them would
        resurrect deleted/compacted rows, so raise (the caller re-runs
        against the fresh snapshot — classic Delta-style conflict
        detection).  Concurrent commits that only touched OTHER files
        (appends, disjoint merges) commute and commit fine."""
        while True:
            v = self.latest_version() + 1
            if v > base_version + 1:
                active, _ = self._snapshot_files()
                active_rel = {
                    os.path.relpath(os.path.normpath(p),
                                    os.path.normpath(self.path))
                    for p in active
                }
                gone = [p for p in removed if p not in active_rel]
                if gone:
                    raise RuntimeError(
                        "concurrent commit conflict: segments removed by "
                        f"another writer while this operation ran: {gone}; "
                        "re-run against the current snapshot")
            if self._try_commit(v, actions):
                return v

    def _snapshot_files(self, version: int | None = None) -> tuple[list[str], str | None]:
        """Replay commits 0..version → (active data files, schema json)."""
        latest = self.latest_version()
        if latest < 0:
            raise FileNotFoundError(f"no txlog table at {self.path}")
        v = latest if version is None else version
        if v > latest or v < 0:
            raise ValueError(f"version {v} out of range [0, {latest}]")
        active: dict[str, None] = {}  # insertion-ordered set
        schema_json = None
        for i in range(v + 1):
            for action in self._read_commit(i):
                if "metaData" in action:
                    schema_json = action["metaData"]["schemaJson"]
                elif "add" in action:
                    active[action["add"]["path"]] = None
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
        return [os.path.join(self.path, p) for p in active], schema_json

    # -- segment writing ----------------------------------------------------

    def _write_segments(self, df: DataFrame) -> list[str]:
        """Write ``df`` as immutable parquet segments; return table-relative
        paths.  Each write lands in its own uuid'd subdir so segment names
        never collide across commits (immutability by construction)."""
        sub = f"data-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.path, sub)
        df.write.mode("errorifexists").parquet(out)
        return [
            os.path.join(sub, os.path.basename(p))
            for p in sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        ]

    # -- public ops ---------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str, df: DataFrame,
               overwrite: bool = False) -> "TxLogTable":
        t = cls(spark, path)
        if os.path.exists(t.log_dir):
            if not overwrite:
                raise FileExistsError(f"txlog table already exists at {path}")
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        rel = t._write_segments(df)
        actions = (
            [{"commit": {"op": "CREATE", "ts": int(time.time() * 1000)}},
             {"metaData": {"schemaJson": df.schema.json()}}]
            + [{"add": {"path": p}} for p in rel]
        )
        if not t._try_commit(0, actions):
            raise FileExistsError(f"concurrent create at {path}")
        return t

    def append(self, df: DataFrame) -> int:
        rel = self._write_segments(df)
        actions = (
            [{"commit": {"op": "APPEND", "ts": int(time.time() * 1000)}}]
            + [{"add": {"path": p}} for p in rel]
        )
        while True:
            v = self.latest_version() + 1
            if self._try_commit(v, actions):
                return v

    def read(self, version: int | None = None) -> DataFrame:
        files, schema_json = self._snapshot_files(version)
        if not files:
            schema = T.StructType.fromJson(json.loads(schema_json))
            return self.spark.createDataFrame([], schema)
        # mergeSchema: additive schema evolution across commits — an
        # append that introduced a new column surfaces NULL for rows from
        # older segments, exactly like the Delta protocol's read path.
        return (self.spark.read.option("mergeSchema", "true")
                .parquet(*files))

    def merge_upsert(self, updates: DataFrame, key: str) -> int:
        """Copy-on-write MERGE (upsert): rows of ``updates`` replace
        same-key rows; unmatched update rows are inserted.

        Only segments that contain at least one matched key are rewritten:
        a semi-join of the snapshot against the update keys (broadcast —
        the update batch is the small side by assumption) yields the
        touched file list; every other segment survives by reference.
        """
        base_version = self.latest_version()
        files, _ = self._snapshot_files()
        upd_keys = updates.select(key).distinct()
        touched: list[str] = []
        if files:
            base = (self.spark.read.option("mergeSchema", "true")
                    .parquet(*files))
            touched_rows = (
                base.withColumn("_file", F.input_file_name())
                .join(F.broadcast(upd_keys), key, "left_semi")
                .select("_file").distinct().collect()
            )
            # input_file_name returns file:// URIs; normalize to paths.
            touched = sorted(
                r["_file"].removeprefix("file://").removeprefix("file:")
                for r in touched_rows
            )
        if touched:
            # mergeSchema + allowMissingColumns: rewriting a pre-evolution
            # segment must not drop (or trip over) columns added later.
            keep_base = (self.spark.read.option("mergeSchema", "true")
                         .parquet(*touched)
                         .join(F.broadcast(upd_keys), key, "left_anti"))
            merged = keep_base.unionByName(updates,
                                           allowMissingColumns=True)
        else:
            merged = updates
        rel_new = self._write_segments(merged)
        rel_removed = [
            os.path.relpath(os.path.normpath(p), os.path.normpath(self.path))
            for p in touched
        ]
        actions = (
            [{"commit": {"op": "MERGE", "ts": int(time.time() * 1000),
                         "filesRewritten": len(rel_removed),
                         "filesAdded": len(rel_new)}}]
            + [{"remove": {"path": p}} for p in rel_removed]
            + [{"add": {"path": p}} for p in rel_new]
        )
        return self._commit_with_occ(actions, rel_removed, base_version)

    def delete_where(self, condition) -> int:
        """Copy-on-write DELETE: rewrite only segments holding matches."""
        base_version = self.latest_version()
        files, _ = self._snapshot_files()
        if not files:
            raise FileNotFoundError("empty table")
        base = (self.spark.read.option("mergeSchema", "true")
                .parquet(*files)
                .withColumn("_file", F.input_file_name()))
        touched = sorted(
            r["_file"].removeprefix("file://").removeprefix("file:")
            for r in base.filter(condition).select("_file").distinct().collect()
        )
        if not touched:
            return self.latest_version()
        # SQL DELETE semantics: only rows where the predicate is TRUE go;
        # NULL-evaluating rows survive (a bare ~condition would drop them).
        survivors = (self.spark.read.option("mergeSchema", "true")
                     .parquet(*touched)
                     .filter(~F.coalesce(condition, F.lit(False))))
        rel_new = self._write_segments(survivors)
        rel_removed = [
            os.path.relpath(os.path.normpath(p), os.path.normpath(self.path))
            for p in touched
        ]
        actions = (
            [{"commit": {"op": "DELETE", "ts": int(time.time() * 1000)}}]
            + [{"remove": {"path": p}} for p in rel_removed]
            + [{"add": {"path": p}} for p in rel_new]
        )
        return self._commit_with_occ(actions, rel_removed, base_version)

    def optimize_compact(self, target_segments: int = 2) -> int:
        """OPTIMIZE-style compaction: rewrite the current snapshot into
        ``target_segments`` larger segments — same rows, new layout.  Old
        segments are de-listed (still readable via time travel) so small
        files from many streaming/merge commits stop taxing scan planning.
        At 100 TB this runs per partition with a size threshold; the
        commit shape (remove-many, add-few) is identical."""
        base_version = self.latest_version()
        files, _ = self._snapshot_files()
        if not files:
            return self.latest_version()
        compacted = (self.spark.read.option("mergeSchema", "true")
                     .parquet(*files).repartition(target_segments))
        rel_new = self._write_segments(compacted)
        rel_removed = [
            os.path.relpath(os.path.normpath(p), os.path.normpath(self.path))
            for p in files
        ]
        actions = (
            [{"commit": {"op": "OPTIMIZE", "ts": int(time.time() * 1000),
                         "filesRewritten": len(rel_removed),
                         "filesAdded": len(rel_new)}}]
            + [{"remove": {"path": p}} for p in rel_removed]
            + [{"add": {"path": p}} for p in rel_new]
        )
        return self._commit_with_occ(actions, rel_removed, base_version)

    def vacuum(self) -> list[str]:
        """Physically delete data files no longer referenced by the LATEST
        snapshot.  Irreversible: time travel to versions that needed the
        removed segments stops working (real VACUUM semantics — the
        retention tradeoff is the caller's).  The commit log itself is
        kept (it is the audit trail and stays tiny).  Returns the deleted
        table-relative paths."""
        live, _ = self._snapshot_files()
        live_set = {os.path.normpath(p) for p in live}
        removed = []
        for sub in sorted(os.listdir(self.path)):
            if not sub.startswith("data-"):
                continue
            seg_dir = os.path.join(self.path, sub)
            for f in sorted(os.listdir(seg_dir)):
                fp = os.path.normpath(os.path.join(seg_dir, f))
                if f.endswith(".parquet") and fp not in live_set:
                    os.remove(fp)
                    removed.append(os.path.relpath(fp, self.path))
            if not any(n.endswith(".parquet") for n in os.listdir(seg_dir)):
                shutil.rmtree(seg_dir)
        return removed

    def history(self) -> list[dict]:
        """Commit metadata rows, oldest first."""
        out = []
        for i in range(self.latest_version() + 1):
            for action in self._read_commit(i):
                if "commit" in action:
                    out.append({"version": i, **action["commit"]})
        return out
