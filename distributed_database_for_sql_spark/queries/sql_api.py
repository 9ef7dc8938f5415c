"""SQL-string entry point + subquery shapes (SURVEY.md §2.C, §3.4).

These queries execute through `Engine.sql(...)` — the literal contract
the reference's Raft log was built to carry (opaque SQL command strings,
/root/reference/src/raft/node.go:16-19) — proving the command strings
actually parse, plan, and run.  Catalyst rewrites the subqueries into
the same semi/anti/broadcast joins the DataFrame API produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """CTE + window over an aggregate: cumulative monthly revenue.

    The cumulative window is deliberately UNPARTITIONED (WindowExec
    warning): it runs over the *monthly aggregate* — dozens of rows
    after the groupBy at any SF, since months don't scale with data —
    and a ROWS BETWEEN cumulative over a date spine is inherently
    single-partition.  Not a scale risk; the heavy lifting (the groupBy)
    is fully distributed."""
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
    "sql_group_by_all_topn",
    oracle="""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ALL
    )
    SELECT region, nation, cents
    FROM rev
    QUALIFY ROW_NUMBER() OVER (PARTITION BY region
                               ORDER BY cents DESC, nation) <= 2
    ORDER BY region, cents DESC, nation
    """,
    tags=("sql", "group-by-all", "window", "topn"),
)
def sql_group_by_all_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``GROUP BY ALL`` (every non-aggregate select item becomes
    a grouping key — no drift between the projection and the GROUP BY
    list) feeding a top-2-nations-per-region window filter.  OSS Spark
    has no QUALIFY clause yet, so the filter is a wrapped subquery here;
    the DuckDB oracle states the identical semantics WITH QUALIFY —
    certifying the rewrite is meaning-preserving.  All distributed: one
    shuffle for the agg, one for the tiny per-region window."""
    return _sql(spark, sf_dir, """
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ALL
    )
    SELECT region, nation, cents FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY region
                                   ORDER BY cents DESC, nation) AS rn
      FROM rev
    ) WHERE rn <= 2
    ORDER BY region, cents DESC, nation
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


@register(
    "sql_recursive_cte",
    # Recursive month-ladder + left join: classic gap-free reporting
    # spine built WITH RECURSIVE (Spark 4 syntax parity with DuckDB).
    # Months with zero orders must still appear (n_orders = 0).
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT 0
      UNION ALL
      SELECT m + 1 FROM months WHERE m < 23
    ), tagged AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
             + EXTRACT(month FROM o_orderdate) - 1 AS m,
             o_totalprice
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1997-01-01'
    )
    SELECT months.m AS month_idx,
           COUNT(tagged.m) AS n_orders,
           CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)),
                         0) AS BIGINT) AS total_cents
    FROM months LEFT JOIN tagged ON months.m = tagged.m
    GROUP BY months.m
    ORDER BY months.m
    """,
    tags=("sql", "recursive-cte", "gapfill"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL command path (Spark 4): a 24-month
    spine generated by the recursive member, left-joined against two
    years of orders so empty months surface as zero rows — the gap-free
    reporting pattern where the spine MUST come from recursion (the
    anchor/step form), not a table scan.  Identical SQL runs on DuckDB;
    the recursion is depth-bounded and the join spine is 24 rows, so at
    100 TB the only real work is the orders-side aggregation."""
    cmd = """
    WITH RECURSIVE months(m) AS (
      SELECT 0
      UNION ALL
      SELECT m + 1 FROM months WHERE m < 23
    ), tagged AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
             + EXTRACT(month FROM o_orderdate) - 1 AS m,
             o_totalprice
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1997-01-01'
    )
    SELECT months.m AS month_idx,
           COUNT(tagged.m) AS n_orders,
           CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)),
                         0) AS BIGINT) AS total_cents
    FROM months LEFT JOIN tagged ON months.m = tagged.m
    GROUP BY months.m
    ORDER BY months.m
    """
    return _sql(spark, sf_dir, cmd)


@register(
    "fn_variant_suite",
    # events.props is a JSON string ({"k": <int>}); Spark parses it into
    # the VARIANT type (the Spark 4 semi-structured storage type) and
    # extracts typed fields; DuckDB recomputes via its JSON functions.
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
           COUNT(json_extract(props, '$.missing')) AS n_missing_field
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("function", "variant", "json", "semi-structured"),
)
def fn_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json → variant
    column, typed variant_get extraction, and absent-path NULL semantics
    — the open-schema ingestion path for event payloads (shredded at
    scan time instead of string re-parsing per expression).  The oracle
    recomputes every figure with DuckDB's JSON functions."""
    from ..catalog import load_table

    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.parse_json("props").alias("pv"))
    extracted = v.select(
        "event_type",
        F.try_variant_get("pv", "$.k", "long").alias("k"),
        F.try_variant_get("pv", "$.missing", "long").alias("missing"))
    return (
        extracted.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum("k").alias("k_sum"),
             F.min("k").alias("k_min"),
             F.max("k").alias("k_max"),
             F.count("missing").alias("n_missing_field"))
        .orderBy("event_type")
    )


@register(
    "sql_parameterized_args",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderkey <= 5000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql", "parameters", "api"),
)
def sql_parameterized_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers (Spark 4 `spark.sql(..., args=...)`): the
    safe-templating API that replaces string interpolation for dashboard
    / service queries (values bound as literals by the analyzer, no
    injection surface).  The oracle runs the same query with the values
    inlined — binding must be semantically identical to literals."""
    from ..engine import Engine

    Engine(spark, sf_dir)  # registers the table views
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderkey <= :max_key
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 150000.0, "max_key": 5000},
    )


@register(
    "sql_udf_scalar",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sql", "udf", "create-function"),
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 `CREATE TEMPORARY FUNCTION
    ... RETURN <expr>`): user abstractions that stay INSIDE Catalyst —
    the body is inlined into the plan (codegen, pushdown-friendly), so
    unlike a Python UDF there is no serialization boundary.  The repo's
    floor-quantize cents convention is itself defined as a SQL UDF here;
    the oracle recomputes the expressions inline."""
    cmd_prep = [
        "CREATE OR REPLACE TEMPORARY FUNCTION to_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(x * 100 + 0.5) AS BIGINT)",
        "CREATE OR REPLACE TEMPORARY FUNCTION is_debt(x DOUBLE) "
        "RETURNS INT RETURN CASE WHEN x < 0 THEN 1 ELSE 0 END",
    ]
    eng = Engine(spark, sf_dir)
    for c in cmd_prep:
        eng.sql(c)
    return eng.sql("""
        SELECT c_mktsegment,
               COUNT(*) AS n_cust,
               CAST(SUM(to_cents(c_acctbal)) AS BIGINT) AS total_cents,
               CAST(SUM(is_debt(c_acctbal)) AS BIGINT) AS n_negative
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """)
