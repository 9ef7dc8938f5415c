"""Custom Python DataSource (the PySpark 4 `spark.dataSource` extension
point): a row-group-parallel Arrow reader.

This is the engine's template for ingesting formats Spark has no native
connector for (internal corpus services, bespoke shard manifests, REST
catalogs): subclass `DataSource`/`DataSourceReader`, declare the schema,
split the input into `InputPartition`s at planning time, and yield Arrow
RecordBatches per partition — executors pull batches in parallel, the
driver never touches row data.

The demo source reads a parquet file through pyarrow one ROW GROUP per
Spark partition — i.e. it re-implements parallel parquet scanning in
user space, which is exactly the split discipline any custom source
needs at 100 TB (planning-time split list, per-split streaming reads,
zero driver materialization).  Arrow batches keep the Python boundary
per-batch, not per-row.

The reference has no file I/O at all (SURVEY.md §2.D — its log is an
in-memory Go slice); this extends §2.C "sources" with the extension-
point path.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class ArrowParquetReader(DataSourceReader):
    def __init__(self, path: str, columns: list[str] | None):
        self.path = path
        self.columns = columns
        self.filters: list = []

    def pushFilters(self, filters):
        """Filter pushdown (the PySpark 4.1 half of the extension
        point): comparison filters on top-level columns are recorded
        for ROW-GROUP pruning — ``partitions()`` consults the parquet
        footer statistics and never plans a split whose min/max range
        cannot match.  EVERY filter is yielded back as unsupported, so
        Spark still applies it row-level: footer stats only prove which
        row groups CANNOT match (the same conservative contract as the
        txlog's file-level data skipping)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        comparable = (EqualTo, GreaterThan, GreaterThanOrEqual,
                      LessThan, LessThanOrEqual)
        self.filters = [f for f in filters
                        if isinstance(f, comparable)
                        and len(f.attribute) == 1]
        yield from filters

    @staticmethod
    def _group_may_match(md_rg, col_idx: dict, f) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        name = f.attribute[0]
        if name not in col_idx:
            return True
        stats = md_rg.column(col_idx[name]).statistics
        if stats is None or not stats.has_min_max:
            return True  # no stats → cannot prove absence, keep
        lo, hi, v = stats.min, stats.max, f.value
        try:
            if isinstance(f, EqualTo):
                return lo <= v <= hi
            if isinstance(f, GreaterThan):
                return hi > v
            if isinstance(f, GreaterThanOrEqual):
                return hi >= v
            if isinstance(f, LessThan):
                return lo < v
            return lo <= v  # LessThanOrEqual
        except TypeError:
            return True  # incomparable types (e.g. decimal vs str): keep

    def partitions(self):
        import pyarrow.parquet as pq

        md = pq.ParquetFile(self.path).metadata
        col_idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
        out = []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            if all(self._group_may_match(rg, col_idx, f)
                   for f in self.filters):
                out.append(_RowGroupPartition(self.path, g))
        # an all-pruned scan still needs one (empty) partition
        return out or [_RowGroupPartition(self.path, -1)]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        if partition.row_group < 0:
            return  # every row group was stats-pruned
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(row_groups=[partition.row_group],
                                     columns=self.columns):
            yield batch


class ArrowParquetDataSource(DataSource):
    """``format("arrowpq")``: batch reads take ``path`` (one parquet
    file); streaming reads take ``dir`` (a landing directory of
    immutable parquet files); ``columns`` (csv list) prunes both."""

    @classmethod
    def name(cls) -> str:
        return "arrowpq"

    def schema(self):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if path is None:
            # streaming form: schema from the first landing file
            d = self.options["dir"]
            landed = sorted(f for f in os.listdir(d)
                            if f.endswith(".parquet"))
            if not landed:
                raise ValueError(
                    f"arrowpq stream: landing directory {d!r} holds no "
                    ".parquet file yet, so the schema cannot be "
                    "inferred — land the first file before starting "
                    "the stream, or pass an explicit .schema(...) to "
                    "the reader")
            path = os.path.join(d, landed[0])
        sch = pq.read_schema(path)
        cols = self._columns()
        if cols:
            sch = pa.schema([sch.field(c) for c in cols])
        return from_arrow_schema(sch)

    def _columns(self) -> list[str] | None:
        cols = self.options.get("columns")
        return [c.strip() for c in cols.split(",")] if cols else None

    def reader(self, schema) -> ArrowParquetReader:
        return ArrowParquetReader(self.options["path"], self._columns())

    def streamReader(self, schema) -> "ArrowParquetStreamReader":
        return ArrowParquetStreamReader(self.options["dir"],
                                        self._columns())


class _FileRowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class ArrowParquetStreamReader(DataSourceStreamReader):
    """Streaming half of the extension point (PySpark 4
    ``DataSourceStreamReader``): treats a DIRECTORY of immutable parquet
    landing files as an append-only feed.

    Offsets are ``{"files": n}`` — the count of files consumed in
    lexicographic order, so the landing contract is the classic one:
    files are immutable once visible and named in arrival order
    (``part-00001…``).  ``latestOffset`` lists the directory (driver,
    metadata-scale); ``partitions`` splits each newly arrived file into
    one InputPartition PER ROW GROUP, and ``read`` streams that row
    group's Arrow batches on an EXECUTOR — planning-time split list,
    per-split streaming reads, zero driver row materialization: the
    same 100 TB split discipline as the batch reader, now per
    micro-batch.  Exactly-once falls out of deterministic offsets +
    Spark's checkpointed commit log."""

    def __init__(self, dir_path: str, columns: list[str] | None):
        self.dir_path = dir_path
        self.columns = columns

    def _files(self) -> list[str]:
        import os

        return sorted(
            os.path.join(self.dir_path, f)
            for f in os.listdir(self.dir_path) if f.endswith(".parquet"))

    def initialOffset(self) -> dict:
        return {"files": 0}

    def latestOffset(self) -> dict:
        return {"files": len(self._files())}

    def partitions(self, start: dict, end: dict):
        import pyarrow.parquet as pq

        out = []
        for path in self._files()[start["files"]:end["files"]]:
            for g in range(pq.ParquetFile(path).num_row_groups):
                out.append(_FileRowGroupPartition(path, g))
        # a drained range still needs one (empty) partition: Spark
        # requires at least one partition per micro-batch plan
        return out or [_FileRowGroupPartition("", -1)]

    def read(self, partition: _FileRowGroupPartition):
        import pyarrow.parquet as pq

        if partition.row_group < 0:
            return
        pf = pq.ParquetFile(partition.path)
        yield from pf.iter_batches(row_groups=[partition.row_group],
                                   columns=self.columns)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: offsets are directory positions


def register_arrow_source(spark) -> None:
    """Idempotently register the arrowpq source on a session (and turn
    on Python-data-source filter pushdown, off by default in Spark —
    without it a reader implementing pushFilters refuses to plan)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(ArrowParquetDataSource)
    except Exception:  # already registered in this session
        pass
