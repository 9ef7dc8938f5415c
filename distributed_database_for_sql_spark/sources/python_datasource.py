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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class ArrowParquetReader(DataSourceReader):
    def __init__(self, path: str, columns: list[str] | None):
        self.path = path
        self.columns = columns

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroupPartition(self.path, g) for g in range(n)]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(row_groups=[partition.row_group],
                                     columns=self.columns):
            yield batch


class ArrowParquetDataSource(DataSource):
    """`format("arrowpq")`: options path (required), columns (csv list)."""

    @classmethod
    def name(cls) -> str:
        return "arrowpq"

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        sch = pq.read_schema(self.options["path"])
        cols = self._columns()
        if cols:
            sch = pa.schema([sch.field(c) for c in cols])
        return from_arrow_schema(sch)

    def _columns(self) -> list[str] | None:
        cols = self.options.get("columns")
        return [c.strip() for c in cols.split(",")] if cols else None

    def reader(self, schema) -> ArrowParquetReader:
        return ArrowParquetReader(self.options["path"], self._columns())


def register_arrow_source(spark) -> None:
    """Idempotently register the arrowpq source on a session."""
    try:
        spark.dataSource.register(ArrowParquetDataSource)
    except Exception:  # already registered in this session
        pass
