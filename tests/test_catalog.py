from distributed_database_for_sql_spark import TABLES
from distributed_database_for_sql_spark.catalog import load_table, register_views


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_register_views_sql_visible(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    assert n > 0


def test_events_loader_handles_both_timestamp_layouts(spark, tmp_path):
    """The driver regenerates testdata between rounds and has shipped
    events.ts as TIMESTAMP(NANOS) in some generations and
    TIMESTAMP(MICROS) in others; load_table must read BOTH to the same
    session-TZ timestamp column."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from distributed_database_for_sql_spark.catalog import load_table

    base = [1_700_000_000_000_000, 1_700_000_123_456_789]  # microseconds
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    for unit, scale in (("us", 1), ("ns", 1000)):
        d = tmp_path / f"gen_{unit}"
        d.mkdir()
        tbl = pa.table({**cols, "ts": pa.array(
            [v * scale for v in base], pa.timestamp(unit))})
        pq.write_table(tbl, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), unit
        got = sorted(r.ts for r in df.select("ts").collect())
        # Both layouts must surface identical microsecond instants.
        import datetime as dt

        want = sorted(
            dt.datetime.fromtimestamp(v / 1_000_000, dt.timezone.utc)
            .replace(tzinfo=None) for v in base)
        assert got == want, unit


def test_arrowpq_pushdown_prunes_row_groups(spark, tmp_path):
    """The custom Python DataSource's pushFilters: comparison filters
    prune parquet ROW GROUPS via footer stats at planning time (fewer
    input partitions), every filter stays residual (Spark re-applies it
    row-level), and values are exact including the all-pruned case."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

    from distributed_database_for_sql_spark.sources.python_datasource import (
        ArrowParquetReader,
        register_arrow_source,
    )

    path = str(tmp_path / "f.parquet")
    tbl = pa.table({"id": list(range(1000)),
                    "v": [i * 2 for i in range(1000)]})
    pq.write_table(tbl, path, row_group_size=100)  # 10 sorted row groups

    r = ArrowParquetReader(path, None)
    residual = list(r.pushFilters([GreaterThan(("id",), 850)]))
    assert len(residual) == 1, "every filter must stay residual"
    assert len(r.partitions()) == 2  # groups [800,900) and [900,1000)

    r2 = ArrowParquetReader(path, None)
    list(r2.pushFilters([GreaterThan(("id",), 120),
                         LessThanOrEqual(("id",), 180)]))
    assert len(r2.partitions()) == 1  # only group [100,200)

    register_arrow_source(spark)
    df = (spark.read.format("arrowpq").option("path", path).load()
          .filter("id > 850"))
    assert df.count() == 149
    assert df.agg({"id": "sum"}).collect()[0][0] == sum(range(851, 1000))
    empty = (spark.read.format("arrowpq").option("path", path).load()
             .filter("id > 5000"))
    assert empty.count() == 0


def test_arrowpq_stream_empty_landing_dir_refuses_clearly(spark, tmp_path):
    """A stream started before the first landing file arrives must fail
    with a descriptive error naming the directory and the remedy — not
    an opaque IndexError from sorted(listdir)[0]."""
    import pytest

    from distributed_database_for_sql_spark.sources.python_datasource import (
        register_arrow_source,
    )

    register_arrow_source(spark)
    d = tmp_path / "landing"
    d.mkdir()
    with pytest.raises(Exception, match="no\\s+.parquet file yet"):
        (spark.readStream.format("arrowpq").option("dir", str(d)).load()
         .writeStream.format("memory").queryName("empty_landing")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
