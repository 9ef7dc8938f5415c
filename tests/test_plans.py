"""Physical-plan guards: the scale-critical properties stay true
(pushdown, pruning, broadcast, no stray Cartesian products)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_database_for_sql_spark.catalog import load_table
from distributed_database_for_sql_spark.plans.explain import (
    has_cartesian,
    has_pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
)
from distributed_database_for_sql_spark.queries import registry


def test_q6_filters_push_to_scan(spark):
    q6 = registry()["q6_forecast_revenue"]
    df = q6.fn(spark, "/root/testdata/sf0.001")
    assert has_pushed_filters(df)


def test_projection_prunes_scan_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    cols = scan_read_schema(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_q5_star_join_broadcasts_dims(spark):
    q5 = registry()["q5_local_supplier_volume"]
    df = q5.fn(spark, "/root/testdata/sf0.001")
    assert uses_broadcast_join(df)
    assert not has_cartesian(df)


def test_no_cartesian_in_relational_queries(spark):
    specs = registry()
    for name in ["q1_pricing_summary", "q3_shipping_priority",
                 "window_topk_per_group", "join_theta_range"]:
        df = specs[name].fn(spark, "/root/testdata/sf0.001")
        assert not has_cartesian(df), name
