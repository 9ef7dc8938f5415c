"""SQL-string entry point + subquery shapes (SURVEY.md §2.C, §3.4).

These queries execute through `Engine.sql(...)` — the literal contract
the reference's Raft log was built to carry (opaque SQL command strings,
/root/reference/src/raft/node.go:16-19) — proving the command strings
actually parse, plan, and run.  Catalyst rewrites the subqueries into
the same semi/anti/broadcast joins the DataFrame API produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..engine import Engine
from .base import register


def _sql(spark: SparkSession, sf_dir: str, command: str) -> DataFrame:
    return Engine(spark, sf_dir).sql(command)


@register(
    "sql_entry_revenue_by_nation",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("sql", "join", "agg"),
)
def sql_entry_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A command string executed verbatim via Engine.sql — same text runs
    on both engines (the dialect-neutral subset)."""
    cmd = """
    SELECT n_name,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """
    return _sql(spark, sf_dir, cmd)


@register(
    "subq_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
    ORDER BY o_orderkey
    """,
    tags=("sql", "subquery"),
)
def subq_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (planned as a broadcast of one value)."""
    return _sql(spark, sf_dir, """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
    ORDER BY o_orderkey
    """)


@register(
    "subq_in_nation_region",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation
      WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    )
    ORDER BY c_custkey
    """,
    tags=("sql", "subquery", "semi"),
)
def subq_in_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries → Catalyst rewrites to semi-join chain."""
    return _sql(spark, sf_dir, """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation
      WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    )
    ORDER BY c_custkey
    """)


@register(
    "subq_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity >= 49
    )
    ORDER BY s_suppkey
    """,
    tags=("sql", "subquery", "semi"),
)
def subq_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated to a semi-join by Catalyst."""
    return _sql(spark, sf_dir, """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity >= 49
    )
    ORDER BY s_suppkey
    """)


@register(
    "subq_correlated_scalar",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT 2.5 * AVG(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """,
    tags=("sql", "subquery", "correlated"),
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer average) — decorrelated
    into an aggregate + join, not a per-row loop."""
    return _sql(spark, sf_dir, """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT 2.5 * AVG(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """)


@register(
    "sql_cte_window",
    oracle="""
    WITH monthly AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS mo,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(mo AS TIMESTAMP) AS mo,
           ROUND(revenue, 2) AS revenue,
           ROUND(SUM(revenue) OVER (ORDER BY mo
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_revenue
    FROM monthly
    ORDER BY mo
    """,
    tags=("sql", "cte", "window"),
)
def sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window over an aggregate: cumulative monthly revenue."""
    return _sql(spark, sf_dir, """
    WITH monthly AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS mo,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT mo,
           ROUND(revenue, 2) AS revenue,
           ROUND(SUM(revenue) OVER (ORDER BY mo
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_revenue
    FROM monthly
    ORDER BY mo
    """)


@register(
    "sql_command_log_apply",
    oracle="""
    SELECT src, COUNT(*) AS n, ROUND(SUM(val), 2) AS total
    FROM (
      SELECT 'region' AS src, CAST(r_regionkey AS DOUBLE) AS val FROM region
      UNION ALL
      SELECT 'nation' AS src, CAST(n_nationkey AS DOUBLE) AS val FROM nation
      UNION ALL
      SELECT 'orders' AS src, o_totalprice AS val FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ) t
    GROUP BY src
    ORDER BY src
    """,
    tags=("sql", "command-log", "streaming", "exactly-once"),
)
def sql_command_log_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole contract, end to end: a sequence of opaque
    SQL command strings appended to a durable log, applied EXACTLY ONCE
    and IN ORDER by a checkpointed streaming foreachBatch
    (engine.CommandLog ≙ applyCh delivery,
    /root/reference/src/raft/node.go:35,
    /root/reference/src/raft/replication.go:88-103), then the resulting
    state queried.

    The command sequence is CTAS + two INSERTs into the same table:
    applying any command twice, dropping one, or reordering (INSERT
    before CTAS fails) changes the final hash, so the DuckDB match
    certifies ordered exactly-once apply — the one behavioral guarantee
    the reference actually implements.  Log/checkpoint dirs are scoped
    to the Spark application id: a rerun in the same session replays
    nothing (checkpoint says committed) and returns identical state."""
    import os
    import tempfile

    from ..engine import CommandLog

    eng = Engine(spark, sf_dir)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tbl = f"cmdlog_state_{app}"
    base = os.path.join(tempfile.gettempdir(), f"cmdlog_{app}")
    log = CommandLog(eng, os.path.join(base, "log"),
                     os.path.join(base, "ckpt"))
    loc = os.path.join(base, "state_table")  # explicit LOCATION: never
    # write into the (possibly repo-relative) default warehouse
    if log._seq == 0:  # first run in this session: append the program
        log.append(
            f"CREATE TABLE IF NOT EXISTS {tbl} USING parquet "
            f"LOCATION '{loc}' AS "
            "SELECT 'region' AS src, CAST(r_regionkey AS DOUBLE) AS val "
            "FROM region",
            f"INSERT INTO {tbl} "
            "SELECT 'nation' AS src, CAST(n_nationkey AS DOUBLE) AS val "
            "FROM nation",
        )
        log.append(
            f"INSERT INTO {tbl} "
            "SELECT 'orders' AS src, o_totalprice AS val FROM orders "
            "WHERE o_orderpriority = '1-URGENT'",
        )
    log.replay()
    return eng.sql(f"""
        SELECT src, COUNT(*) AS n, ROUND(SUM(val), 2) AS total
        FROM {tbl} GROUP BY src ORDER BY src
    """)


@register(
    "sql_distribute_cluster_by",
    # DISTRIBUTE BY / SORT BY control the physical shuffle + in-partition
    # order without a global sort; the RESULT is partition-order-
    # dependent, so the query aggregates per-partition facts that are
    # deterministic: each l_suppkey lands in exactly one partition
    # (that is the DISTRIBUTE BY contract under a fixed partition
    # count), so per-key rows stay together regardless of which
    # partition id they drew.
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_rows,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
    tags=("sql", "distribute", "physical"),
)
def sql_distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL physical-layout clauses: DISTRIBUTE BY (hash shuffle on the
    key) + SORT BY (in-partition order) — i.e. CLUSTER BY — then a
    per-key aggregate over the clustered stream.  The aggregate proves
    the clustering preserved every row exactly once; the clause pair is
    the SQL spelling of repartition + sortWithinPartitions, the layout
    step before a bucketed write at 100 TB."""
    cmd = """
    SELECT l_suppkey, COUNT(*) AS n_rows,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM (
      SELECT l_suppkey, l_quantity FROM lineitem
      DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_quantity
    )
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """
    return _sql(spark, sf_dir, cmd)


@register(
    "sql_lateral_topn",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice_cents
    FROM customer c,
         LATERAL (
           SELECT o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT)
                    AS o_totalprice_cents
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) o
    WHERE c.c_custkey <= 100
    ORDER BY c.c_custkey, o_totalprice_cents DESC, o.o_orderkey
    """,
    tags=("sql", "lateral", "subquery", "topn"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL command path: each
    customer's top-2 orders by price, written as a per-row dependent
    subquery (the SQL spelling of top-k-per-group).  Catalyst
    decorrelates it into the same window/rank plan the DataFrame form
    produces — proving the entry point handles dependent join syntax,
    not just flat SELECTs.  Deterministic tie-breaks keep both engines'
    LIMIT 2 identical."""
    cmd = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice_cents
    FROM customer c,
         LATERAL (
           SELECT o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT)
                    AS o_totalprice_cents
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) o
    WHERE c.c_custkey <= 100
    ORDER BY c.c_custkey, o_totalprice_cents DESC, o.o_orderkey
    """
    return _sql(spark, sf_dir, cmd)
