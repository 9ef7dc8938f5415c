"""Structured-Streaming SOURCE over the txlog Change Data Feed, via the
PySpark 4 Python DataSource streaming extension point
(``pyspark.sql.datasource.SimpleDataSourceStreamReader``).

``spark.readStream.format("txlogcdf").option("path", table_dir)`` turns
the transaction log's change feed (sources/txlog.py) into a replayable
micro-batch stream: offsets ARE commit versions, so a micro-batch is
exactly "the change rows of versions [start, end)" — deterministic,
replayable after failure (``readBetweenOffsets``), and naturally
exactly-once downstream of a checkpointed sink.  This is the
streaming-consumption arm of the CDF contract: a 100 TB downstream
pipeline subscribes to the table and receives inserts, update
pre/postimages, and deletes as they commit, instead of rescanning.

The reader runs driver-side in plain Python (the DataSource API's
contract for Simple readers — right for change feeds, which are small
relative to the table by design; a partition-parallel DataSourceStream-
Reader is the upgrade path if a single commit's change set outgrows the
driver).  Files are read with pyarrow; no SparkSession exists here.

The reference (a Go Raft core) streams its replicated log to state
machines (/root/reference/src/raft/replication.go:88-103) — this is the
same shape with the table's commit log as the stream.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_LOG_DIR = "_txlog"


def _commit_files(table_path: str) -> list[str]:
    return sorted(
        p for p in glob.glob(os.path.join(table_path, _LOG_DIR, "[0-9]*.json"))
        if os.path.basename(p).partition(".")[2] == "json"
        and os.path.basename(p).partition(".")[0].isdigit()
    )


def _latest_version(table_path: str) -> int:
    files = _commit_files(table_path)
    if not files:
        return -1
    return int(os.path.splitext(os.path.basename(files[-1]))[0])


def _read_commit(table_path: str, version: int) -> list[dict]:
    fp = os.path.join(table_path, _LOG_DIR, f"{version:08d}.json")
    with open(fp) as f:
        return [json.loads(line) for line in f if line.strip()]


#: commit ops that add no data rows and change no existing rows — always
#: transparent to BOTH stream readers.  RENAME/DROP COLUMN are
#: metadata-only by construction (no file is touched); constraint DDL and
#: protocol changes likewise; CLONE's commit 0 is the destination table's
#: initial snapshot (zero-copy refs into the source), which an
#: incremental stream starting at the clone point should not re-emit.
_NO_ROW_OPS = ("OPTIMIZE", "REORG", "ADD CONSTRAINT",
               "DROP CONSTRAINT", "RENAME COLUMN", "ADD COLUMN",
               "DROP COLUMN", "CLONE", "SET TBLPROPERTIES",
               "ALTER COLUMN", "SET DEFAULT", "DROP DEFAULT", "CLUSTER BY",
               "SET ROW TRACKING", "ADD FEATURE")


def _commit_ts(table_path: str, version: int) -> int:
    for a in _read_commit(table_path, version):
        if "commit" in a:
            return int(a["commit"].get("ts", -1))
    return -1


def _resolve_start_version(options: dict) -> int:
    """``startversion`` (commit number) or ``startingtimestamp`` (epoch
    millis, or ``YYYY-MM-DD[ HH:MM:SS]`` UTC) — Delta's mutually
    exclusive stream-start options.  A timestamp resolves to the FIRST
    commit at-or-after it (Delta's startingTimestamp contract: begin
    with changes committed at or after the given time); in-commit
    timestamps are monotonic, so this is a simple ordered scan of the
    tiny JSON log."""
    path = options["path"]
    files = _commit_files(path)
    earliest = (int(os.path.splitext(os.path.basename(files[0]))[0])
                if files else 0)
    ts = options.get("startingtimestamp")
    if ts is None:
        sv = int(options.get("startversion", earliest))
        if sv < earliest:
            raise ValueError(
                f"startversion {sv} predates the retained log — "
                "metadata cleanup (delta.logRetentionDuration) removed "
                f"commits below {earliest}; start there or later")
        return sv
    if "startversion" in options:
        raise ValueError(
            "startversion and startingtimestamp are mutually exclusive")
    raw = str(ts).strip().strip("'\"")
    if raw.isdigit():
        target = int(raw)
    else:
        import datetime as _dt

        fmt = "%Y-%m-%d %H:%M:%S" if " " in raw else "%Y-%m-%d"
        dt = _dt.datetime.strptime(raw, fmt).replace(
            tzinfo=_dt.timezone.utc)
        target = int(dt.timestamp() * 1000)
    latest = _latest_version(path)
    for v in range(earliest, latest + 1):
        if _commit_ts(path, v) >= target:
            return v
    return latest + 1  # nothing committed yet at/after the time


def _mapping_timeline(table_path: str, up_to: int) -> list[tuple[int, dict]]:
    """Column-mapping HISTORY over commits [0, up_to]: a list of
    (version, {logical: physical}) entries, one per commit that changed
    the mapping, seeded with the identity mapping at version -1.

    Two kinds of files need two different resolutions (ADVICE r7 — the
    single latest-mapping lookup silently NULLed renamed columns in CDF
    rows): DATA segments store PHYSICAL column names, which never change
    once written, so the latest mapping resolves them regardless of
    writing version; CDF sidecars are written from LOGICAL-named frames
    (txlog.py _write_change_data runs after the physical->logical
    rename), so their keys are the logical names AS OF the commit that
    wrote them — resolving those needs the mapping at that version."""
    timeline: list[tuple[int, dict]] = [(-1, {})]
    for v in range(up_to + 1):
        for action in _read_commit(table_path, v):
            if "metaData" in action and "columnMapping" in action["metaData"]:
                timeline.append((v, action["metaData"]["columnMapping"]))
    return timeline


def _field_keys(timeline: list[tuple[int, dict]], data_fields: list[str],
                v: int) -> dict[str, tuple[str, ...]]:
    """Per served logical field, the parquet keys to probe (in order) for
    a row from commit ``v``: the logical name AS OF v (CDF sidecar rows),
    the stable physical name (data-segment rows), and the served name
    itself (identity fallback).  The first key present in the row dict
    wins — a parquet file carries either all-physical or all-logical-at-v
    names, never a mix, so the probe order cannot mis-bind."""
    latest = timeline[-1][1]
    at_v: dict = {}
    for ver, mp in timeline:
        if ver <= v:
            at_v = mp
    inv_at_v = {p: l for l, p in at_v.items()}
    out: dict[str, tuple[str, ...]] = {}
    for c in data_fields:
        p = latest.get(c, c)
        keys = []
        for k in (inv_at_v.get(p, p), p, c):
            if k not in keys:
                keys.append(k)
        out[c] = tuple(keys)
    return out


def _pick(r: dict, keys: tuple[str, ...]):
    for k in keys:
        if k in r:
            return r[k]
    return None


def _table_schema(table_path: str) -> T.StructType:
    """Last metaData action's schema across the whole log (plain file
    IO; the log is tiny JSON)."""
    schema_json = None
    for v in range(_latest_version(table_path) + 1):
        for action in _read_commit(table_path, v):
            if "metaData" in action:
                schema_json = action["metaData"]["schemaJson"]
    if schema_json is None:
        raise ValueError(f"no txlog metaData found under {table_path}")
    return T.StructType.fromJson(json.loads(schema_json))


class TxLogChangesStreamReader(SimpleDataSourceStreamReader):
    """Offsets are commit versions: ``{"version": v}`` = next unread."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        self.start_version = _resolve_start_version(options)
        # Delta's maxFilesPerTrigger analogue at the commit granularity:
        # bound how many versions one micro-batch drains, so a stream
        # starting against a long backlog catches up in bounded batches
        # (bounded memory + bounded recovery replay) instead of one
        # giant batch.  0 = unbounded (default).
        self.max_versions = int(options.get("maxversionspertrigger", 0))
        # field order fixed by the declared schema; the last two are the
        # CDF metadata columns appended by the data source
        self.fields = [f.name for f in schema.fields]
        self.data_fields = self.fields[:-2]

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def read(self, start: dict):
        latest = _latest_version(self.path)
        if start["version"] > latest:
            return iter([]), start
        if self.max_versions > 0:
            latest = min(latest, start["version"] + self.max_versions - 1)
        end = {"version": latest + 1}
        return iter(self._rows(start["version"], latest)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["version"], end["version"] - 1))

    def commit(self, end: dict) -> None:
        pass  # the log is the source of truth; nothing to acknowledge

    # -- change-row materialization (pyarrow, no Spark) ---------------------

    def _parquet_rows(self, rel_paths: list[str]) -> list[dict]:
        import pyarrow.parquet as pq

        rows: list[dict] = []
        for rel in rel_paths:
            p = os.path.join(self.path, rel)
            if os.path.isdir(p):
                parts = sorted(glob.glob(os.path.join(p, "*.parquet")))
            else:
                parts = [p]
            for f in parts:
                rows.extend(pq.read_table(f).to_pylist())
        return rows

    def _txn_step_records(self, actions: list[dict], v: int) -> list[dict]:
        """Per-statement change rows of a TXN commit: actions are grouped
        by their txnStep marker — each statement serves its own cdf
        (rewrites) or synthesizes inserts from its own adds (appends); a
        flat scan would misread a mixed txn (same logic as
        TxLogTable.read_changes)."""
        groups: list[dict] = []
        cur: dict | None = None
        for x in actions:
            if "txnStep" in x:
                cur = {"op": x["txnStep"].get("op"), "adds": [], "cdf": []}
                groups.append(cur)
            elif cur is None:
                continue
            elif "add" in x:
                cur["adds"].append(x["add"]["path"])
            elif "cdf" in x:
                cur["cdf"].append(x["cdf"]["path"])
        recs: list[dict] = []
        for g in groups:
            if g["cdf"]:
                recs.extend(self._parquet_rows(g["cdf"]))
            elif g["op"] in ("CREATE", "APPEND", "CONVERT",
                             "COPY INTO"):
                for r in self._parquet_rows(g["adds"]):
                    r["_change_type"] = "insert"
                    recs.append(r)
            elif g["op"] in _NO_ROW_OPS:
                continue
            else:
                raise ValueError(
                    f"statement {g['op']!r} in TXN commit {v} carries no "
                    "change data — the table must run with "
                    "enable_cdf=True to be streamed")
        return recs

    def _rows(self, a: int, b: int):
        out = []
        timeline = _mapping_timeline(self.path, b)
        for v in range(a, b + 1):
            actions = _read_commit(self.path, v)
            op = next((x["commit"]["op"] for x in actions if "commit" in x),
                      None)
            cdf = [x["cdf"]["path"] for x in actions if "cdf" in x]
            if op == "TXN":
                recs = self._txn_step_records(actions, v)
            elif cdf:
                recs = self._parquet_rows(cdf)
            elif op in ("CREATE", "APPEND", "CONVERT", "COPY INTO"):
                adds = [x["add"]["path"] for x in actions if "add" in x]
                recs = self._parquet_rows(adds)
                for r in recs:
                    r["_change_type"] = "insert"
            elif op in _NO_ROW_OPS:
                continue  # metadata/layout only: no row-level changes
            else:
                raise ValueError(
                    f"commit {v} ({op}) carries no change data — the "
                    "table must run with enable_cdf=True to be streamed")
            # CDF sidecar rows carry logical-as-of-v names, data-segment
            # rows physical names (ADVICE r7): probe both per field.
            keys = _field_keys(timeline, self.data_fields, v)
            for r in recs:
                out.append(tuple(
                    [_pick(r, keys[c]) for c in self.data_fields]
                    + [r["_change_type"], v]))
        return out


class TxLogChangesDataSource(DataSource):
    """``format("txlogcdf")``: options path (txlog table root),
    startversion (default 0)."""

    @classmethod
    def name(cls) -> str:
        return "txlogcdf"

    def schema(self) -> T.StructType:
        base = _table_schema(self.options["path"])
        return T.StructType(
            list(base.fields)
            + [T.StructField("_change_type", T.StringType(), False),
               T.StructField("_commit_version", T.IntegerType(), False)])

    def simpleStreamReader(self, schema: T.StructType):
        return TxLogChangesStreamReader(schema, self.options)


def register_txlog_cdf_source(spark) -> None:
    """Idempotently register the txlogcdf source on a session."""
    try:
        spark.dataSource.register(TxLogChangesDataSource)
    except Exception:  # already registered in this session
        pass


class TxLogTableStreamReader(SimpleDataSourceStreamReader):
    """Append-only TABLE streaming (Delta's default ``readStream`` on a
    table, no CDF needed): each micro-batch is the rows of the segments
    ADDED by commits [start, end) — offsets are commit versions, so
    batches are deterministic and failure-replayable.  Non-append
    commits are Delta-faithful: MERGE/DELETE/UPDATE/RESTORE raise
    (the stream cannot represent row changes without CDF) unless
    ``skipchangecommits`` is set (Delta's skipChangeCommits), which
    serves only the appended segments and ignores rewrites.  OPTIMIZE
    and metadata-only commits are always transparent: they add no rows,
    so compaction never re-emits data (rewritten segments are NOT
    re-served — only segments added by CREATE/APPEND commits count)."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        self.start_version = _resolve_start_version(options)
        self.skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower() == "true")
        self.max_versions = int(options.get("maxversionspertrigger", 0))
        self.fields = [f.name for f in schema.fields]
        self.data_fields = self.fields[:-1]  # last = _commit_version

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def read(self, start: dict):
        latest = _latest_version(self.path)
        if start["version"] > latest:
            return iter([]), start
        if self.max_versions > 0:
            # catch-up rate limiting (Delta's maxFilesPerTrigger shape)
            latest = min(latest, start["version"] + self.max_versions - 1)
        end = {"version": latest + 1}
        return iter(self._rows(start["version"], latest)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["version"], end["version"] - 1))

    def commit(self, end: dict) -> None:
        pass

    def _parquet_rows(self, rel_paths: list[str]) -> list[dict]:
        import pyarrow.parquet as pq

        rows: list[dict] = []
        for rel in rel_paths:
            p = os.path.join(self.path, rel)
            if os.path.isdir(p):
                parts = sorted(glob.glob(os.path.join(p, "*.parquet")))
            else:
                parts = [p]
            for f in parts:
                rows.extend(pq.read_table(f).to_pylist())
        return rows

    def _rows(self, a: int, b: int):
        out = []
        timeline = _mapping_timeline(self.path, b)
        for v in range(a, b + 1):
            actions = _read_commit(self.path, v)
            op = next((x["commit"]["op"] for x in actions if "commit" in x),
                      None)
            if op == "TXN":
                # per-statement: serve append steps' adds; a rewrite step
                # poisons the append-only contract exactly like a
                # standalone rewrite commit (unless skipChangeCommits)
                recs = []
                cur_op = None
                for x in actions:
                    if "txnStep" in x:
                        cur_op = x["txnStep"].get("op")
                        if cur_op not in ("CREATE", "APPEND", "CONVERT",
                                          "COPY INTO") \
                                and cur_op not in _NO_ROW_OPS \
                                and not self.skip_change_commits:
                            raise ValueError(
                                f"statement {cur_op!r} in TXN commit {v} "
                                "changes existing rows; an append-only "
                                "table stream cannot represent it — use "
                                "the CDF source (format 'txlogcdf') or "
                                "set skipChangeCommits")
                    elif "add" in x and cur_op in ("CREATE", "APPEND",
                                                   "CONVERT", "COPY INTO"):
                        recs.extend(self._parquet_rows([x["add"]["path"]]))
            elif op in ("CREATE", "APPEND", "CONVERT", "COPY INTO"):
                adds = [x["add"]["path"] for x in actions if "add" in x]
                recs = self._parquet_rows(adds)
            elif op in _NO_ROW_OPS:
                continue  # layout/metadata only: no new rows (ADVICE r6:
                #             includes RENAME/DROP COLUMN and CLONE)
            elif self.skip_change_commits:
                continue  # Delta skipChangeCommits: ignore rewrites
            else:
                raise ValueError(
                    f"commit {v} ({op}) changes existing rows; an "
                    "append-only table stream cannot represent it — "
                    "use the CDF source (format 'txlogcdf') or set "
                    "skipChangeCommits to ignore rewrites")
            # appends store PHYSICAL column names; serve them under the
            # logical schema (ADVICE r6/r7 — probe logical-as-of-v too so
            # any future logical-named source composes the same way)
            keys = _field_keys(timeline, self.data_fields, v)
            for r in recs:
                out.append(tuple(
                    [_pick(r, keys[c]) for c in self.data_fields] + [v]))
        return out


class TxLogTableDataSource(DataSource):
    """``format("txlogtable")``: options path (txlog table root),
    startversion (default 0), skipchangecommits (default false)."""

    @classmethod
    def name(cls) -> str:
        return "txlogtable"

    def schema(self) -> T.StructType:
        base = _table_schema(self.options["path"])
        return T.StructType(
            list(base.fields)
            + [T.StructField("_commit_version", T.IntegerType(), False)])

    def simpleStreamReader(self, schema: T.StructType):
        return TxLogTableStreamReader(schema, self.options)


def register_txlog_table_source(spark) -> None:
    """Idempotently register the txlogtable source on a session."""
    try:
        spark.dataSource.register(TxLogTableDataSource)
    except Exception:  # already registered in this session
        pass
