"""UniForm-shape Apache Iceberg metadata export for txlog tables.

Delta Lake's UniForm feature maintains a SECOND metadata tree — Iceberg
``metadata.json`` + manifest-list + manifest files — over the SAME parquet
data files the Delta log tracks, so Iceberg-native engines (Trino, Flink,
Snowflake, BigQuery, DuckDB-iceberg) can plan and read the table without
understanding the Delta log.  Zero data files are copied or rewritten;
only metadata is emitted (the same economics as ``clone_to`` and the
symlink manifests in ``txlog.generate_manifest``).

This module implements that export over the engine's own ACID txlog:

- ``generate(table)`` writes/refreshes the Iceberg metadata tree under
  ``<table>/metadata/`` for the current (or a given) snapshot, with
  MANIFEST REUSE: a manifest whose data files are all still active is
  carried forward into the new snapshot's manifest list untouched, so a
  steady append workload does O(new files) metadata work per refresh,
  not O(table) — the property that makes per-commit refresh viable on a
  100k-file table.  Removed files retire their manifest; its surviving
  entries are rewritten once into the new snapshot's manifest.
- ``plan_files(path)`` / ``read_snapshot(spark, path)`` play the role of
  an Iceberg-native reader: version-hint -> metadata.json -> current
  snapshot -> manifest list -> manifests -> data files, never touching
  ``_txlog/``.  The registry query ``delta_uniform_iceberg_export``
  certifies the round-trip (paths + record counts + values) against a
  DuckDB oracle.

Layout follows the Iceberg v2 table spec (format-version 2, field-id'd
schemas, identity partition specs, sequence numbers, snapshot log,
metadata log) with one documented deviation: manifest lists and
manifests are serialized as JSON with the spec's field names, not Avro —
this container carries no Avro codec, and the STRUCTURE (what references
what, which counts/bounds ride where) is the part the engine owns; a
production writer would swap the codec, not the shape.  Bounds are
serialized as JSON values rather than Iceberg's binary single-value
encoding for the same reason.

Snapshots are DETERMINISTIC: snapshot-id and sequence-number are the
txlog version, timestamps are in-commit timestamps, and the table UUID
is derived from the table path — regenerating the same version twice is
byte-stable, which is what lets the export be oracle-certified.

Tables whose current snapshot carries DELETION VECTORS export Iceberg
v2 POSITION DELETES (r14): each DV sidecar's (file, row-position)
tombstones are rewritten once into a real parquet delete file with the
spec's schema — ``file_path`` (field-id 2147483546) + ``pos``
(2147483545) — tracked by a delete manifest (``content = 1``) in the
snapshot's manifest list, so merge-on-read tables stay exportable
without forcing a REORG PURGE.  ``read_snapshot`` applies them the way
an Iceberg MoR reader does: broadcast anti-join on (file, position),
with positions served by the parquet scanner's ``_metadata.row_index``.
Because each snapshot's delete files capture the FULL DV state at that
version (not an incremental diff), sequence-number ordering rules are
trivially satisfied and a REORG PURGE simply retires the delete
manifest on the next refresh.  The delete file is reused across
refreshes while the DV set is unchanged (same economics as data-
manifest reuse).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_METADATA_DIR = "metadata"
_VERSION_HINT = "version-hint.text"

# Spark simpleString / schema-json type -> Iceberg primitive type name.
_PRIMITIVES = {
    "boolean": "boolean",
    "byte": "int",       # Iceberg has no 8/16-bit ints; widen (spec rule)
    "short": "int",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "timestamptz",      # Spark TimestampType is UTC-adjusted
    "timestamp_ntz": "timestamp",
    "string": "string",
    "binary": "binary",
}


def _iceberg_type(spark_type, next_id) -> object:
    """Spark schema-json type node -> Iceberg type (spec names), assigning
    stable field ids depth-first in declaration order via ``next_id``."""
    if isinstance(spark_type, str):
        if spark_type in _PRIMITIVES:
            return _PRIMITIVES[spark_type]
        if spark_type.startswith("decimal"):
            return spark_type  # decimal(p,s): same spelling in both specs
        raise ValueError(f"no Iceberg mapping for Spark type {spark_type!r}")
    t = spark_type["type"]
    if t == "struct":
        fields = []
        for f in spark_type["fields"]:
            fid = next_id()
            fields.append({
                "id": fid,
                "name": f["name"],
                "required": not f.get("nullable", True),
                "type": _iceberg_type(f["type"], next_id),
            })
        return {"type": "struct", "fields": fields}
    if t == "array":
        eid = next_id()
        return {"type": "list", "element-id": eid,
                "element-required": not spark_type.get("containsNull", True),
                "element": _iceberg_type(spark_type["elementType"],
                                         next_id)}
    if t == "map":
        kid, vid = next_id(), next_id()
        return {"type": "map", "key-id": kid, "value-id": vid,
                "key": _iceberg_type(spark_type["keyType"], next_id),
                "value": _iceberg_type(spark_type["valueType"], next_id),
                "value-required": not spark_type.get("valueContainsNull",
                                                     True)}
    raise ValueError(f"no Iceberg mapping for Spark type node {t!r}")


def schema_to_iceberg(schema_json: str, schema_id: int = 0) -> dict:
    """Spark StructType JSON -> Iceberg schema (field ids assigned
    depth-first in declaration order — deterministic, so an unchanged
    Spark schema always maps to the identical Iceberg schema and schema
    evolution detection can compare dicts directly)."""
    counter = {"n": 0}

    def next_id() -> int:
        counter["n"] += 1
        return counter["n"]

    top = _iceberg_type(json.loads(schema_json), next_id)
    return {"type": "struct", "schema-id": schema_id,
            "fields": top["fields"]}


def _schema_field_ids(schema: dict) -> dict[str, int]:
    return {f["name"]: f["id"] for f in schema["fields"]}


def _partition_spec(schema: dict, partition_cols: list[str],
                    spec_id: int = 0) -> dict:
    """Identity partition spec over the table's partition columns
    (partition field ids start at 1000 per the Iceberg spec)."""
    ids = _schema_field_ids(schema)
    return {"spec-id": spec_id,
            "fields": [{"name": c, "transform": "identity",
                        "source-id": ids[c], "field-id": 1000 + i}
                       for i, c in enumerate(partition_cols)]}


def _hive_partition_values(rel_path: str) -> dict[str, str]:
    """key=value components of a table-relative path (the layout the
    txlog's partitioned writer emits)."""
    out: dict[str, str] = {}
    for comp in os.path.dirname(rel_path).split(os.sep):
        if "=" in comp:
            k, _, v = comp.partition("=")
            out[k] = v
    return out


def metadata_dir(table_path: str) -> str:
    return os.path.join(table_path, _METADATA_DIR)


def _parquet_row_count(abs_path: str) -> int:
    """Row count from the parquet FOOTER (metadata-only read)."""
    import pyarrow.parquet as pq
    return pq.ParquetFile(abs_path).metadata.num_rows


def _write_position_deletes(table, mdir: str, v: int,
                            dvs: dict[str, list[str]]) -> dict | None:
    """Rewrite the snapshot's DV sidecars into ONE Iceberg v2 position-
    delete parquet file — the spec's delete schema ``file_path`` (string,
    field-id 2147483546) + ``pos`` (long, 2147483545), field ids embedded
    as parquet field metadata — plus the delete manifest (content=1)
    that tracks it, returning the manifest-list entry (None when the
    live DV state holds no rows).  Deterministic: rows are deduped and
    sorted by (file_path, pos), so regenerating the same DV state is
    byte-stable.  Cost is O(tombstoned rows) — the DV scale, never the
    data scale — and the result is REUSED across refreshes while the DV
    fingerprint is unchanged (see generate)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    # (target, sidecar) pairs that are live at this snapshot: a sidecar
    # written for several targets stays on disk after one target is
    # rewritten, so rows must filter to the log's CURRENT binding.
    active_pairs = {(tgt, d) for tgt, dl in dvs.items() for d in dl}
    pairs: set[tuple[str, int]] = set()
    for s in sorted({d for dl in dvs.values() for d in dl}):
        t_ = pq.read_table(os.path.join(table.path, s),
                           columns=["path", "row_index"])
        for rel, pos in zip(t_.column("path").to_pylist(),
                            t_.column("row_index").to_pylist()):
            if (rel, s) in active_pairs:
                pairs.add((os.path.abspath(
                    os.path.join(table.path, rel)), int(pos)))
    rows = sorted(pairs)
    if not rows:
        return None
    schema = pa.schema([
        pa.field("file_path", pa.string(), nullable=False,
                 metadata={b"PARQUET:field_id": b"2147483546"}),
        pa.field("pos", pa.int64(), nullable=False,
                 metadata={b"PARQUET:field_id": b"2147483545"}),
    ])
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"file_path": [r[0] for r in rows],
                  "pos": [r[1] for r in rows]}, schema=schema), buf)
    dpath = os.path.join(mdir, f"delete-{v:08d}-0000.parquet")
    table.log_store.overwrite_atomic(dpath, buf.getvalue())
    man_rows = [{
        "status": 1,
        "snapshot_id": v,
        "sequence_number": v,
        "data_file": {
            "content": 1,  # POSITION_DELETES
            "file_path": os.path.abspath(dpath),
            "file_format": "PARQUET",
            "partition": {},
            "record_count": len(rows),
            "file_size_in_bytes": len(buf.getvalue()),
        },
    }]
    mpath = os.path.join(mdir, f"manifest-del-{v:08d}-0000.json")
    payload = "".join(json.dumps(r, sort_keys=True) + "\n"
                      for r in man_rows).encode()
    table.log_store.overwrite_atomic(mpath, payload)
    return {
        "manifest_path": os.path.abspath(mpath),
        "manifest_length": len(payload),
        "partition_spec_id": 0,
        "content": 1,
        "sequence_number": v,
        "min_sequence_number": v,
        "added_snapshot_id": v,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": len(rows),
        "existing_rows_count": 0,
        "partitions": {},
    }


def generate(table, version: int | None = None) -> str:
    """Write/refresh the Iceberg metadata tree for ``table``'s snapshot
    at ``version`` (default: current).  Returns the new metadata.json
    path.  Idempotent per version — regenerating the same version
    rewrites byte-identical files.  O(new + removed files) metadata work
    thanks to manifest reuse; never touches data files.

    Parity anchor: Delta UniForm's ``delta.universalFormat.enabledFormats
    = iceberg``; the on-disk layout mirrors an Iceberg Hadoop-catalog
    table (version-hint.text + v<N>.metadata.json).

    The version is resolved FIRST and the file set read AT that version
    (ADVICE r13: reading the snapshot before resolving ``v`` let a
    concurrent commit land in between, permanently labeling version N's
    file set as snapshot N+1 — the already-exported early-return then
    kept the wrong snapshot forever)."""
    v = table.latest_version() if version is None else version
    active, schema_json, dvs = table._snapshot_full(v)
    ts = table._commit_ts(v)
    mdir = metadata_dir(table.path)
    os.makedirs(mdir, exist_ok=True)

    prev = _read_current_metadata(table.path)  # None on first export
    schema = schema_to_iceberg(schema_json)
    schemas, current_schema_id = [schema], 0
    specs, spec_id = None, 0
    snapshots: list[dict] = []
    snapshot_log: list[dict] = []
    metadata_log: list[dict] = []
    refs: dict[str, dict] = {}
    if prev is not None:
        prev_meta, prev_path = prev
        refs = dict(prev_meta.get("refs", {}))
        if any(s["snapshot-id"] == v for s in prev_meta["snapshots"]):
            return prev_path  # this version is already exported
        # schema evolution: keep every historical schema, bump the id
        # only when the CURRENT schema really changed
        schemas = list(prev_meta["schemas"])
        cur = schemas[prev_meta["current-schema-id"]]
        stripped = {k: vv for k, vv in schema.items() if k != "schema-id"}
        if {k: vv for k, vv in cur.items() if k != "schema-id"} == stripped:
            current_schema_id = prev_meta["current-schema-id"]
        else:
            current_schema_id = len(schemas)
            schemas.append(dict(schema, **{"schema-id": current_schema_id}))
        specs = prev_meta["partition-specs"]
        spec_id = prev_meta["default-spec-id"]
        snapshots = list(prev_meta["snapshots"])
        snapshot_log = list(prev_meta["snapshot-log"])
        metadata_log = list(prev_meta["metadata-log"]) + [
            {"timestamp-ms": prev_meta["last-updated-ms"],
             "metadata-file": os.path.abspath(prev_path)}]
    schema = schemas[current_schema_id]
    part_cols = table._partition_columns()
    want_spec = _partition_spec(schema, part_cols, 0)
    if specs is None:
        specs = [want_spec]
    else:
        # partition evolution: append a new spec when the identity
        # column set changed (Iceberg keeps every historical spec)
        cur_spec = next(s for s in specs if s["spec-id"] == spec_id)
        if [f["name"] for f in cur_spec["fields"]] != part_cols:
            spec_id = max(s["spec-id"] for s in specs) + 1
            specs = specs + [_partition_spec(schema, part_cols, spec_id)]

    # ---- manifests: reuse intact ones, write one for the delta ---------
    # The reuse DECISION is metadata-only (VERDICT r13 item 4): each
    # export writes a path-index sidecar (.pathindex-<v>.json, engine-
    # private — the Iceberg tree itself stays spec-shaped) mapping each
    # manifest to its file paths, so a refresh decides reuse from ONE
    # index read instead of re-parsing every live manifest.  Manifests
    # are opened only when they must be REWRITTEN: partially-dead ones
    # (for the survivors' original snapshot lineage) and — only when
    # compaction triggers — the reused set.  An append-only refresh
    # therefore opens zero prior manifests.
    abs_active = {os.path.abspath(os.path.join(table.path, p)): stats
                  for p, stats in active.items()}
    rel_by_abs = {os.path.abspath(os.path.join(table.path, p)): p
                  for p in active}
    props = table.properties()
    reused: list[dict] = []
    covered: set[str] = set()
    kept_rows: list[dict] = []  # surviving prior entries (for compaction)
    lazy_kept: list[str] = []   # reused-but-unread manifests (ditto)
    prior_row: dict[str, dict] = {}  # lineage of still-active survivors
    index_paths: dict[str, list[str]] = {}  # new snapshot's path index
    prev_full_index: dict | None = None
    if snapshots:
        newest = max(snapshots, key=lambda s: s["sequence-number"])
        prev_full_index = _load_path_index(mdir, newest["snapshot-id"])
        prev_index = None if prev_full_index is None \
            else prev_full_index.get("manifests")
        for entry in _read_manifest_list(newest["manifest-list"]):
            if entry.get("content", 0) != 0:
                continue  # delete manifests carry no data-file paths
            mp = entry["manifest_path"]
            paths = None if prev_index is None else prev_index.get(mp)
            rows = None
            if paths is None:  # pre-index export: fall back to the read
                rows = _read_manifest(mp)
                paths = [e["data_file"]["file_path"] for e in rows]
            if paths and all(p in abs_active for p in paths) \
                    and not (covered & set(paths)):
                reused.append(dict(
                    entry,
                    added_files_count=0,
                    existing_files_count=len(paths),
                    deleted_files_count=0,
                    added_rows_count=0))
                covered.update(paths)
                index_paths[mp] = list(paths)
                if rows is not None:
                    kept_rows.extend(rows)
                else:
                    lazy_kept.append(mp)
            else:
                # a PARTIALLY-dead manifest retires; its still-active
                # rows re-enter a new manifest as EXISTING with their
                # ORIGINAL snapshot lineage (Iceberg rewrite semantics).
                # A FULLY-dead manifest has nothing to carry — skipped
                # without ever being opened.
                if rows is None:
                    if not any(p in abs_active for p in paths):
                        continue
                    rows = _read_manifest(mp)
                for r in rows:
                    p = r["data_file"]["file_path"]
                    if p in abs_active:
                        prior_row[p] = r

    def _file_row(ap: str) -> dict:
        prev_row = prior_row.get(ap)
        if prev_row is not None:
            return dict(prev_row, status=0)
        stats = abs_active[ap] or {}
        rel = rel_by_abs[ap]
        records = stats.get("numRecords")
        if records is None:
            # Iceberg REQUIRES record_count on data_file, but adds from
            # pre-stats commits or CONVERT-imported files may carry no
            # numRecords (ADVICE r13) — backfill from the parquet
            # footer: one metadata read, the data pages stay closed,
            # and only genuinely stat-less NEW files pay it.
            records = _parquet_row_count(ap)
        return {
            "status": 1,  # ADDED (this snapshot introduces the entry)
            "snapshot_id": v,
            "sequence_number": v,
            "data_file": {
                "content": 0,  # DATA
                "file_path": ap,
                "file_format": "PARQUET",
                "partition": _hive_partition_values(rel),
                "record_count": records,
                "file_size_in_bytes": os.path.getsize(ap),
                "null_value_counts": stats.get("nullCount") or {},
                "lower_bounds": stats.get("minValues") or {},
                "upper_bounds": stats.get("maxValues") or {},
            },
        }

    def _write_manifest(rows: list[dict], i: int) -> dict:
        mpath = os.path.join(mdir, f"manifest-{v:08d}-{i:04d}.json")
        payload = "".join(json.dumps(r, sort_keys=True) + "\n"
                          for r in rows).encode()
        table.log_store.overwrite_atomic(mpath, payload)
        index_paths[os.path.abspath(mpath)] = [
            r["data_file"]["file_path"] for r in rows]
        # partition summary: distinct identity values per partition col,
        # the manifest-list-level skip index Iceberg keeps (bounded by
        # the partition cardinality inside ONE manifest)
        summary: dict[str, list] = {}
        for r in rows:
            for c, val in r["data_file"]["partition"].items():
                summary.setdefault(c, [])
                if val not in summary[c]:
                    summary[c].append(val)
        return {
            "manifest_path": os.path.abspath(mpath),
            "manifest_length": len(payload),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": v,
            "min_sequence_number": min(
                (r["sequence_number"] for r in rows), default=v),
            "added_snapshot_id": v,
            "added_files_count": sum(1 for r in rows if r["status"] == 1),
            "existing_files_count": sum(1 for r in rows
                                        if r["status"] == 0),
            "deleted_files_count": 0,
            "added_rows_count": sum(
                r["data_file"]["record_count"] or 0
                for r in rows if r["status"] == 1),
            "partitions": {c: sorted(vals)
                           for c, vals in summary.items()},
        }

    fresh_paths = sorted(set(abs_active) - covered)
    max_manifests = int(props.get("txlog.uniform.maxManifests", "8"))
    chunk = max(1, int(props.get("txlog.uniform.manifestChunk", "5000")))
    entries: list[dict]
    if len(reused) + (1 if fresh_paths else 0) > max_manifests:
        # MANIFEST COMPACTION (Iceberg's rewrite_manifests, folded into
        # the refresh): a steady append workload accretes one manifest
        # per refresh, so planning degrades to O(refreshes) metadata
        # reads — past the cap, rewrite the whole live file set into
        # size-bounded chunks.  Surviving entries keep their ORIGINAL
        # snapshot_id/sequence_number (Iceberg lineage semantics) and
        # re-enter as EXISTING; only genuinely new files are ADDED.
        # Reused-but-unread manifests are hydrated HERE, the one path
        # that genuinely needs their full rows.
        for mp in lazy_kept:
            kept_rows.extend(_read_manifest(mp))
            index_paths.pop(mp, None)
        all_rows = [dict(r, status=0) for r in kept_rows] + \
            [_file_row(ap) for ap in fresh_paths]
        entries = [_write_manifest(all_rows[i:i + chunk], n)
                   for n, i in enumerate(range(0, len(all_rows), chunk))]
    else:
        entries = list(reused)
        if fresh_paths or not entries:
            entries.append(_write_manifest(
                [_file_row(ap) for ap in fresh_paths], 0))

    # ---- position deletes: DV sidecars -> Iceberg v2 delete files ------
    # A snapshot carrying deletion vectors exports content=1 (POSITION
    # DELETES) manifests instead of refusing (r14): each export rewrites
    # the DV state once into a real parquet delete file — O(tombstoned
    # rows), the DV scale — and REUSES it while the DV set is unchanged
    # (fingerprinted in the path-index sidecar), so an append-heavy
    # merge-on-read workload still does O(changed files) metadata work
    # per refresh.  A REORG PURGE empties ``dvs`` and the next refresh
    # simply emits no delete manifest — retirement is automatic.
    delete_entries: list[dict] = []
    dv_state: dict | None = None
    if dvs:
        fingerprint = sorted(
            f"{tgt}\x00{d}" for tgt, dl in dvs.items() for d in dl)
        prev_del = (prev_full_index or {}).get("deletes")
        if prev_del is not None and \
                prev_del.get("fingerprint") == fingerprint:
            for e in prev_del["entries"]:
                n = e.get("added_rows_count", 0) + \
                    e.get("existing_rows_count", 0)
                delete_entries.append(dict(
                    e,
                    added_files_count=0,
                    existing_files_count=e.get("added_files_count", 0)
                    + e.get("existing_files_count", 0),
                    added_rows_count=0,
                    existing_rows_count=n))
        else:
            entry = _write_position_deletes(table, mdir, v, dvs)
            if entry is not None:
                delete_entries.append(entry)
        if delete_entries:
            dv_state = {"fingerprint": fingerprint,
                        "entries": delete_entries}
    entries = entries + delete_entries

    mlist_path = os.path.join(mdir, f"snap-{v:08d}.manifest-list.json")
    table.log_store.overwrite_atomic(
        mlist_path,
        "".join(json.dumps(e, sort_keys=True) + "\n"
                for e in entries).encode())
    # engine-private path index for THIS snapshot's manifests — what
    # makes the NEXT refresh's reuse decision (and VACUUM's retained-
    # snapshot protection) metadata-only.  Missing/corrupt indexes are
    # harmless: readers fall back to parsing the manifests themselves.
    index_doc: dict = {"manifests": {
        mp: paths for mp, paths in sorted(index_paths.items())
        if mp in {e["manifest_path"] for e in entries}}}
    if dv_state is not None:
        index_doc["deletes"] = dv_state
    table.log_store.overwrite_atomic(
        _path_index_path(mdir, v),
        json.dumps(index_doc, sort_keys=True).encode())

    total_records = sum((s or {}).get("numRecords") or 0
                        for s in active.values())
    snapshot = {
        "snapshot-id": v,
        "sequence-number": v,
        "timestamp-ms": ts,
        "manifest-list": os.path.abspath(mlist_path),
        "schema-id": current_schema_id,
        "summary": {"operation": "append" if not snapshots else "overwrite",
                    "total-data-files": str(len(active)),
                    "total-records": str(total_records)},
    }
    if delete_entries:
        # Iceberg summary fields for MoR snapshots: total-records stays
        # the PHYSICAL data-file row count (spec semantics) and the
        # tombstones ride their own counters.
        snapshot["summary"]["total-delete-files"] = str(len(delete_entries))
        snapshot["summary"]["total-position-deletes"] = str(sum(
            e.get("added_rows_count", 0) + e.get("existing_rows_count", 0)
            for e in delete_entries))
    snapshots.append(snapshot)
    snapshot_log.append({"timestamp-ms": ts, "snapshot-id": v})
    # refs survive every refresh (Iceberg's refs map: tags pin
    # historical snapshots — dataset versioning for reproducible
    # reads); "main" always tracks the current snapshot.
    refs["main"] = {"snapshot-id": v, "type": "branch"}

    # COLUMN MAPPING: when the txlog maps logical names to different
    # PHYSICAL parquet column names (RENAME under name/id mapping mode),
    # emit Iceberg's ``schema.name-mapping.default`` — the spec's
    # mechanism for binding parquet columns that carry no field-id
    # metadata to schema field ids by name.  A real Iceberg reader
    # resolves the physical file columns through it; read_snapshot
    # honors it the same way.  (Real UniForm writes exactly this
    # property for column-mapped Delta tables.)
    mapping = {l: p for l, p in table._column_mapping(version).items()
               if l != p}
    properties = {"write.format.default": "parquet"}
    if mapping:
        ids = _schema_field_ids(schema)
        name_mapping = [
            {"field-id": ids[f["name"]],
             "names": sorted({mapping.get(f["name"], f["name"]),
                              f["name"]})}
            for f in schema["fields"]]
        properties["schema.name-mapping.default"] = json.dumps(
            name_mapping, sort_keys=True)

    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     os.path.abspath(table.path))),
        "location": os.path.abspath(table.path),
        "last-sequence-number": v,
        "last-updated-ms": ts,
        "last-column-id": max(
            (f["id"] for s in schemas for f in s["fields"]), default=0),
        "schemas": schemas,
        "current-schema-id": current_schema_id,
        "partition-specs": specs,
        "default-spec-id": spec_id,
        "snapshots": snapshots,
        "current-snapshot-id": v,
        "snapshot-log": snapshot_log,
        "metadata-log": metadata_log,
        "refs": refs,
        "properties": properties,
    }
    meta_path = os.path.join(mdir, f"v{v}.metadata.json")
    table.log_store.overwrite_atomic(
        meta_path, json.dumps(meta, sort_keys=True, indent=1).encode())
    table.log_store.overwrite_atomic(
        os.path.join(mdir, _VERSION_HINT), str(v).encode())
    return meta_path


def _read_current_metadata(table_path: str) -> tuple[dict, str] | None:
    hint = os.path.join(metadata_dir(table_path), _VERSION_HINT)
    try:
        with open(hint) as f:
            n = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None
    p = os.path.join(metadata_dir(table_path), f"v{n}.metadata.json")
    try:
        with open(p) as f:
            return json.load(f), p
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _read_manifest_list(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _read_manifest(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _path_index_path(mdir: str, snapshot_id: int) -> str:
    return os.path.join(mdir, f".pathindex-{snapshot_id:08d}.json")


def _load_path_index(mdir: str, snapshot_id: int) -> dict | None:
    """Engine-private per-snapshot sidecar: ``{"manifests": {manifest
    path: [data-file paths]}, "deletes": {"fingerprint": [...],
    "entries": [...]} | absent}``.  None = pre-index export or
    unreadable; callers fall back to reading the manifests."""
    try:
        with open(_path_index_path(mdir, snapshot_id)) as f:
            got = json.load(f)
        got["manifests"]  # shape check: required key
        return got
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        return None


def referenced_data_files(table_path: str) -> set[str]:
    """Absolute (normpath'd) data-file paths that ANY retained exported
    Iceberg snapshot still references.  This is VACUUM's protection set
    (VERDICT r13 item 1): physically deleting one of these files would
    strand an Iceberg-side reader planning a retained snapshot —
    ``expire_snapshots`` is the sanctioned way to shrink the set, after
    which VACUUM collects normally (real UniForm's maintenance
    contract: expire before/with vacuum).  Empty set when the table has
    never been exported.  Metadata-only: per-snapshot path indexes are
    used where present, manifests are parsed only as a fallback."""
    got = _read_current_metadata(table_path)
    if got is None:
        return set()
    meta, _ = got
    mdir = metadata_dir(table_path)
    out: set[str] = set()
    seen: set[str] = set()
    for s in meta["snapshots"]:
        full_idx = _load_path_index(mdir, s["snapshot-id"])
        idx = None if full_idx is None else full_idx.get("manifests")
        try:
            mlist = _read_manifest_list(s["manifest-list"])
        except FileNotFoundError:
            continue  # half-expired tree: nothing left to protect
        for e in mlist:
            mp = e["manifest_path"]
            if mp in seen or e.get("content", 0) != 0:
                continue
            seen.add(mp)
            paths = None if idx is None else idx.get(mp)
            if paths is None:
                paths = [r["data_file"]["file_path"]
                         for r in _read_manifest(mp)]
            out.update(os.path.normpath(p) for p in paths)
    return out


def current_metadata(table_path: str) -> dict:
    """The Iceberg-reader entry point: version-hint -> metadata.json."""
    got = _read_current_metadata(table_path)
    if got is None:
        raise FileNotFoundError(
            f"no Iceberg metadata under {table_path}/metadata — run "
            "GENERATE iceberg_metadata first")
    return got[0]


def plan_files(table_path: str,
               snapshot_id: int | None = None,
               partition_filter: dict[str, str] | None = None
               ) -> list[dict]:
    """Plan a snapshot the way an Iceberg engine does — metadata.json ->
    snapshot -> manifest list -> manifests -> data_file entries.  Never
    reads ``_txlog/``.  ``partition_filter`` ({col: value}, identity
    transforms) prunes at BOTH Iceberg levels: whole manifests are
    skipped via the manifest-list's per-manifest partition summaries
    (never opened — the metadata-scale win on a 100k-file table), then
    surviving entries filter on their per-file partition tuple.
    Returns the flat data_file dicts (path, format, record_count,
    partition values, bounds)."""
    meta = current_metadata(table_path)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next((s for s in meta["snapshots"] if s["snapshot-id"] == sid),
                None)
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not in the Iceberg metadata (have "
            f"{[s['snapshot-id'] for s in meta['snapshots']]})")
    files: list[dict] = []
    for entry in _read_manifest_list(snap["manifest-list"]):
        if entry.get("content", 0) != 0:
            continue  # delete manifests: planned via plan_deletes
        if partition_filter:
            summary = entry.get("partitions")
            if summary and any(c in summary and val not in summary[c]
                               for c, val in partition_filter.items()):
                continue  # manifest-level skip: file entries never read
        for e in _read_manifest(entry["manifest_path"]):
            part = e["data_file"]["partition"]
            if partition_filter and any(
                    part.get(c) != val
                    for c, val in partition_filter.items()):
                continue
            files.append(e["data_file"])
    return files


def plan_deletes(table_path: str,
                 snapshot_id: int | None = None) -> list[dict]:
    """Plan a snapshot's POSITION-DELETE files (content=1 manifests) the
    way an Iceberg MoR reader does.  Returns the delete ``data_file``
    dicts (parquet files with ``file_path``/``pos`` columns); empty for
    snapshots without deletion vectors.  Never partition-filtered — a
    delete file may tombstone rows in any partition."""
    meta = current_metadata(table_path)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next((s for s in meta["snapshots"] if s["snapshot-id"] == sid),
                None)
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not in the Iceberg metadata (have "
            f"{[s['snapshot-id'] for s in meta['snapshots']]})")
    return [e["data_file"]
            for entry in _read_manifest_list(snap["manifest-list"])
            if entry.get("content", 0) == 1
            for e in _read_manifest(entry["manifest_path"])]


def read_snapshot(spark: SparkSession, table_path: str,
                  snapshot_id: int | None = None,
                  partition_filter: dict[str, str] | None = None,
                  ref: str | None = None) -> DataFrame:
    """Read a snapshot through the ICEBERG metadata only (time travel via
    ``snapshot_id``, or by named ``ref`` — a tag pinned with
    ``create_tag``, the reproducible-dataset read path).  The
    scan is a plain parquet multi-path read, so Catalyst still gets
    column pruning and row-group predicate pushdown on the files the
    Iceberg planning selected; ``partition_filter`` prunes files at the
    metadata level before the scan is even planned.  When the metadata
    carries ``schema.name-mapping.default`` (column-mapped source
    table), physical parquet columns are bound to their field ids by
    name and served under the schema's LOGICAL names — the Iceberg
    reader contract for files without field-id metadata.

    POSITION DELETES (content=1 manifests, exported from DV'd
    snapshots) are applied the way an Iceberg merge-on-read reader
    does: the scanner's ``_metadata.file_path``/``_metadata.row_index``
    pseudo-columns key a broadcast ANTI-JOIN against the delete files'
    (file_path, pos) rows.  The delete set is DV-scale (tombstoned rows
    only), so the broadcast is bounded regardless of table size — the
    same plan shape Iceberg's own Spark reader produces for MoR scans."""
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id OR ref, not both")
        snapshot_id = resolve_ref(table_path, ref)
    files = plan_files(table_path, snapshot_id, partition_filter)
    paths = [f["file_path"] for f in files]
    if not paths:
        raise ValueError(f"snapshot has no data files: {table_path}")
    df = spark.read.parquet(*paths)
    deletes = plan_deletes(table_path, snapshot_id)
    if deletes:
        from pyspark.sql import functions as F
        del_df = (spark.read.parquet(*[d["file_path"] for d in deletes])
                  .select(F.col("file_path").alias("__del_fp"),
                          F.col("pos").alias("__del_pos"))
                  .distinct())
        # file:/abs or file:///abs -> /abs (match the delete file's
        # absolute-path spelling)
        fp = F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/")
        df = (df.withColumn("__fp", fp)
              .withColumn("__pos", F.col("_metadata.row_index"))
              .join(F.broadcast(del_df),
                    (F.col("__fp") == F.col("__del_fp"))
                    & (F.col("__pos") == F.col("__del_pos")),
                    "left_anti")
              .drop("__fp", "__pos"))
    meta = current_metadata(table_path)
    nm_raw = meta.get("properties", {}).get("schema.name-mapping.default")
    if nm_raw:
        sid = meta["current-snapshot-id"] if snapshot_id is None \
            else snapshot_id
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == sid)
        schema = next(s for s in meta["schemas"]
                      if s["schema-id"] == snap["schema-id"])
        logical_by_id = {f["id"]: f["name"] for f in schema["fields"]}
        for entry in json.loads(nm_raw):
            logical = logical_by_id.get(entry["field-id"])
            if logical is None or logical in df.columns:
                continue
            phys = next((n for n in entry["names"] if n in df.columns),
                        None)
            if phys is not None:
                df = df.withColumnRenamed(phys, logical)
    return df


def snapshots_df(spark: SparkSession, table_path: str) -> DataFrame:
    """``SHOW ICEBERG SNAPSHOTS`` — one row per exported snapshot, the
    operator's view of the UniForm tree (Iceberg's ``table.snapshots``
    metadata table shape).  Driver-side metadata fold over metadata.json
    + the manifest lists: counts come from the snapshot summaries and
    manifest-list entries, no data file (or manifest) is ever opened —
    at 100 TB this answers "what can an Iceberg reader time-travel to,
    and how big is each snapshot" from metadata-sized reads."""
    meta = current_metadata(table_path)
    cur = meta["current-snapshot-id"]
    rows = []
    for s in sorted(meta["snapshots"], key=lambda x: x["sequence-number"]):
        entries = _read_manifest_list(s["manifest-list"])
        summ = s.get("summary", {})
        rows.append((
            int(s["snapshot-id"]),
            int(s["sequence-number"]),
            int(s["timestamp-ms"]),
            summ.get("operation", ""),
            int(summ.get("total-data-files", "0")),
            int(summ.get("total-records", "0")),
            int(summ.get("total-delete-files", "0")),
            int(summ.get("total-position-deletes", "0")),
            sum(1 for e in entries if e.get("content", 0) == 0),
            sum(1 for e in entries if e.get("content", 0) == 1),
            int(s["snapshot-id"] == cur),
            int(s.get("schema-id", 0)),
        ))
    return spark.createDataFrame(
        rows,
        "snapshot_id bigint, sequence_number bigint, committed_at_ms "
        "bigint, operation string, total_data_files bigint, "
        "total_records bigint, total_delete_files bigint, "
        "total_position_deletes bigint, data_manifests int, "
        "delete_manifests int, is_current int, schema_id int")


def _rewrite_metadata(meta: dict, meta_path: str) -> None:
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, sort_keys=True, indent=1)
    os.replace(meta_path + ".tmp", meta_path)


def create_tag(table_path: str, name: str,
               snapshot_id: int | None = None) -> dict:
    """Iceberg TAG: a named, immutable ref pinning a snapshot (the
    ``refs`` map in metadata.json) — dataset versioning for
    reproducible reads: a training run tags the snapshot it consumed
    and re-reads EXACTLY those files later regardless of table churn,
    because ``expire_snapshots`` never removes a tagged snapshot (and
    VACUUM's protection set covers every retained snapshot's files).
    Metadata-only: one metadata.json rewrite.  Refuses an existing
    name ("main" included — it is the engine-owned branch ref) and an
    unknown snapshot id; re-creating a tag that already points at the
    SAME snapshot is idempotent (the retry path below depends on it).

    TOCTOU guard: a concurrent refresh (per-commit ``generate``) that
    read the PRE-tag metadata can advance the version hint right after
    our rewrite, silently dropping the tag from the new current file.
    After writing, the hint is re-read; if the current metadata moved,
    the tag is re-applied onto the new file (idempotent — the carried
    refs either already hold it or the name is still absent) — the
    same read-resolve-verify shape as the export race fix in
    ``generate`` itself (ADVICE r13)."""
    sid_pinned: int | None = snapshot_id
    for _ in range(5):
        got = _read_current_metadata(table_path)
        if got is None:
            raise FileNotFoundError(
                f"no Iceberg metadata under {table_path}/metadata — run "
                "GENERATE iceberg_metadata first")
        meta, meta_path = got
        refs = meta.setdefault("refs", {})
        prior = refs.get(name)
        if name == "main" or (
                prior is not None
                and (sid_pinned is None
                     or prior["snapshot-id"] != sid_pinned)):
            raise ValueError(
                f"ref {name!r} already exists — drop it first")
        sid = (meta["current-snapshot-id"] if sid_pinned is None
               else sid_pinned)
        if not any(s["snapshot-id"] == sid for s in meta["snapshots"]):
            raise ValueError(
                f"snapshot {sid} not in the Iceberg metadata (have "
                f"{[s['snapshot-id'] for s in meta['snapshots']]})")
        # pin the RESOLVED snapshot before any retry: a refresh landing
        # mid-create must not silently re-target the tag to its head
        sid_pinned = sid
        refs[name] = {"snapshot-id": sid, "type": "tag"}
        _rewrite_metadata(meta, meta_path)
        got2 = _read_current_metadata(table_path)
        if got2 is not None and got2[1] == meta_path:
            return {"snapshot-id": sid, "type": "tag"}
    raise RuntimeError(
        f"create_tag({name!r}) lost 5 races with concurrent metadata "
        "refreshes; re-run when the refresh storm settles")


def drop_tag(table_path: str, name: str) -> None:
    """Remove a tag, releasing its snapshot to normal expiry.  Refuses
    "main" (engine-owned) and unknown names — silent drops would mask
    caller bugs.  Verify-and-retry like ``create_tag``: a concurrent
    refresh built from the pre-drop metadata would carry the tag back,
    so the drop re-applies until it lands on the current file."""
    if name == "main":
        raise ValueError("'main' is the engine-owned branch ref — it "
                         "always tracks the current snapshot")
    dropped = False
    for _ in range(5):
        got = _read_current_metadata(table_path)
        if got is None:
            raise FileNotFoundError(
                f"no Iceberg metadata under {table_path}/metadata")
        meta, meta_path = got
        refs = meta.get("refs", {})
        if name not in refs:
            if dropped:
                return  # a racing refresh already saw the post-drop refs
            raise KeyError(f"no ref named {name!r} (have {sorted(refs)})")
        del refs[name]
        _rewrite_metadata(meta, meta_path)
        dropped = True
        got2 = _read_current_metadata(table_path)
        if got2 is not None and got2[1] == meta_path:
            return
    raise RuntimeError(
        f"drop_tag({name!r}) lost 5 races with concurrent metadata "
        "refreshes; re-run when the refresh storm settles")


def resolve_ref(table_path: str, name: str) -> int:
    """Ref name -> snapshot id (tags and the "main" branch)."""
    refs = current_metadata(table_path).get("refs", {})
    if name not in refs:
        raise KeyError(f"no ref named {name!r} (have {sorted(refs)})")
    return int(refs[name]["snapshot-id"])


def refs_df(spark: SparkSession, table_path: str) -> DataFrame:
    """``SHOW ICEBERG REFS`` — one row per ref (Iceberg's ``refs``
    metadata table shape): name, type (branch/tag), pinned snapshot."""
    meta = current_metadata(table_path)
    rows = [(n, r.get("type", "tag"), int(r["snapshot-id"]))
            for n, r in sorted(meta.get("refs", {}).items())]
    return spark.createDataFrame(
        rows, "name string, type string, snapshot_id bigint")


def files_df(spark: SparkSession, table_path: str,
             snapshot_id: int | None = None) -> DataFrame:
    """``SHOW ICEBERG FILES`` — one row per data / position-delete file
    of an exported snapshot (Iceberg's ``table.files`` metadata table
    shape): content (0 = DATA, 1 = POSITION_DELETES), path, format,
    identity-partition tuple (JSON), record count, and byte size.
    Planned exactly the way an Iceberg engine plans the snapshot
    (``plan_files`` + ``plan_deletes`` — metadata.json -> manifest list
    -> manifests); no data file is ever opened, so at 100 TB this is a
    metadata-sized answer to "what would a reader scan, and how much"."""
    rows = [(
        int(f.get("content", 0)),
        f["file_path"],
        f.get("file_format", "PARQUET"),
        json.dumps(f.get("partition", {}), sort_keys=True),
        int(f.get("record_count") or 0),
        int(f.get("file_size_in_bytes") or 0),
    ) for f in (plan_files(table_path, snapshot_id)
                + plan_deletes(table_path, snapshot_id))]
    return spark.createDataFrame(
        rows,
        "content int, file_path string, file_format string, "
        "partition string, record_count bigint, file_size_in_bytes bigint")


def manifests_df(spark: SparkSession, table_path: str,
                 snapshot_id: int | None = None) -> DataFrame:
    """``SHOW ICEBERG MANIFESTS`` — one row per manifest in a snapshot's
    manifest list (Iceberg's ``table.manifests`` metadata table shape):
    content kind, byte length, spec id, sequence-number lineage, the
    snapshot that ADDED it, and its added/existing/deleted entry
    counts.  Reads ONLY the manifest list — the manifests themselves
    stay closed, which is what makes this the right tool for judging
    manifest health (compaction pressure, reuse) on a 100k-file
    table."""
    meta = current_metadata(table_path)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next((s for s in meta["snapshots"] if s["snapshot-id"] == sid),
                None)
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not in the Iceberg metadata (have "
            f"{[s['snapshot-id'] for s in meta['snapshots']]})")
    rows = [(
        e["manifest_path"],
        int(e.get("manifest_length") or 0),
        int(e.get("partition_spec_id") or 0),
        int(e.get("content", 0)),
        int(e.get("sequence_number") or 0),
        int(e.get("min_sequence_number") or 0),
        int(e.get("added_snapshot_id") or 0),
        int(e.get("added_files_count") or 0),
        int(e.get("existing_files_count") or 0),
        int(e.get("deleted_files_count") or 0),
        int(e.get("added_rows_count") or 0),
    ) for e in _read_manifest_list(snap["manifest-list"])]
    return spark.createDataFrame(
        rows,
        "manifest_path string, manifest_length bigint, "
        "partition_spec_id int, content int, sequence_number bigint, "
        "min_sequence_number bigint, added_snapshot_id bigint, "
        "added_files_count int, existing_files_count int, "
        "deleted_files_count int, added_rows_count bigint")


def expire_snapshots(table_path: str, keep_last: int | None = None,
                     older_than_ms: int | None = None) -> list[str]:
    """Iceberg's ``expire_snapshots`` maintenance: drop historical
    snapshots from the CURRENT metadata.json (rewritten in place — the
    lineage entry in metadata-log is unaffected) and delete the
    manifest-list / manifest files no retained snapshot references.
    The current snapshot always survives.  Returns the deleted paths.

    This is the UniForm twin of the txlog's ``cleanup_metadata``: the
    Delta log bounds itself by retention, and the Iceberg tree must too,
    or per-commit refresh grows ``snapshots`` without bound."""
    got = _read_current_metadata(table_path)
    if got is None:
        raise FileNotFoundError(
            f"no Iceberg metadata under {table_path}/metadata")
    meta, meta_path = got
    cur = meta["current-snapshot-id"]
    # tag-referenced snapshots are PINNED (Iceberg's rule: expiry
    # never removes a snapshot a ref points to — DROP the tag first);
    # "main" tracks the current snapshot, already protected.
    tagged = {r["snapshot-id"] for n, r in meta.get("refs", {}).items()
              if n != "main"}
    keep = []
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    for i, s in enumerate(snaps):
        is_cur = s["snapshot-id"] == cur
        young = older_than_ms is not None and \
            s["timestamp-ms"] > older_than_ms
        tail = keep_last is not None and i >= len(snaps) - keep_last
        # Iceberg's expireOlderThan + retainLast contract: retain-last
        # is a minimum-retention FLOOR that applies regardless of the
        # age cutoff (ADVICE r13: gating tail on older_than_ms being
        # absent inverted that — snapshots inside the newest-N tail but
        # older than the cutoff were expired).
        if is_cur or young or tail or s["snapshot-id"] in tagged:
            keep.append(s)
    kept_ids = {s["snapshot-id"] for s in keep}
    if len(keep) == len(snaps):
        return []
    live_lists = {s["manifest-list"] for s in keep}
    live_entries = [e for s in keep
                    for e in _read_manifest_list(s["manifest-list"])]
    live_manifests = {e["manifest_path"] for e in live_entries}
    # position-delete parquet files a retained snapshot still plans
    # (content=1 manifests) must survive; an expired snapshot's delete
    # files are engine-owned (they live under metadata/) and collect
    # with their manifest.
    mdir = os.path.normpath(metadata_dir(table_path))
    live_delete_files = {
        r["data_file"]["file_path"]
        for e in live_entries if e.get("content", 0) == 1
        for r in _read_manifest(e["manifest_path"])}
    victims: list[str] = []
    for s in snaps:
        if s["snapshot-id"] in kept_ids:
            continue
        idx = _path_index_path(metadata_dir(table_path), s["snapshot-id"])
        if os.path.exists(idx):
            victims.append(idx)  # engine-private sidecar expires too
        if s["manifest-list"] not in live_lists:
            victims.append(s["manifest-list"])
            for e in _read_manifest_list(s["manifest-list"]):
                if e["manifest_path"] in live_manifests:
                    continue
                victims.append(e["manifest_path"])
                if e.get("content", 0) == 1:
                    for r in _read_manifest(e["manifest_path"]):
                        dp = r["data_file"]["file_path"]
                        if dp not in live_delete_files and \
                                os.path.normpath(dp).startswith(
                                    mdir + os.sep):
                            victims.append(dp)
    meta["snapshots"] = keep
    meta["snapshot-log"] = [
        e for e in meta["snapshot-log"] if e["snapshot-id"] in kept_ids]
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, sort_keys=True, indent=1)
    os.replace(meta_path + ".tmp", meta_path)
    for p in sorted(set(victims)):
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
    return sorted(set(victims))
