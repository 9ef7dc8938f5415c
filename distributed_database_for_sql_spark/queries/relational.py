"""Projections, filters, sorts/limits, set operations, distinct/dedup.

The core row-at-a-time relational surface a SQL command log implies
(SURVEY.md §2.C "Projections / filters", "Sorts / limits / set ops").
Everything here stays inside whole-stage codegen — no UDFs — and every
filter/projection is expressed so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register


@register(
    "proj_computed_columns",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                          AS brand_uc,
           ROUND(p_retailprice * 1.1, 2)           AS price_markup,
           p_size * 2                              AS double_size,
           CONCAT(p_brand, ':', p_type)            AS brand_type
    FROM part
    ORDER BY p_partkey
    """,
    tags=("projection",),
)
def proj_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns and aliasing; column-pruned scan."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_uc"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("price_markup"),
            (F.col("p_size") * 2).alias("double_size"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


@register(
    "filter_compound_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' OR o_orderstatus = 'F')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND NOT (o_custkey % 10 = 3)
    ORDER BY o_orderkey
    """,
    tags=("filter",),
)
def filter_compound_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, BETWEEN, IN, modulo arithmetic in predicates."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            ((F.col("o_orderstatus") == "O") | (F.col("o_orderstatus") == "F"))
            & F.col("o_totalprice").between(50000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ~(F.col("o_custkey") % 10 == 3)
        )
        .select(
            "o_orderkey", "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"), "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


@register(
    "filter_like_patterns",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PRO%' OR p_name LIKE '%_5%'
    ORDER BY p_partkey
    """,
    tags=("filter", "string"),
)
def filter_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with prefix and wildcard-underscore patterns."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("PRO%") | F.col("p_name").like("%_5%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "null_handling",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P')                       AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')  AS status_filled,
           (NULLIF(o_orderstatus, 'P') IS NULL)             AS is_pending,
           (NULLIF(o_orderstatus, 'P') IS NOT NULL)         AS not_pending
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("filter", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif / coalesce / isNull / isNotNull.

    The synthetic tables carry no NULLs, so NULLIF manufactures them —
    exercising three-valued logic end-to-end through codegen.
    """
    orders = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        orders.select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
            status_or_null.isNull().alias("is_pending"),
            status_or_null.isNotNull().alias("not_pending"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "sort_multi_key_limit",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, acctbal DESC, c_custkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def sort_multi_key_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort with deterministic tie-break + limit.

    Runs as TakeOrderedAndProject — per-partition top-25 then a single
    driver-side merge, never a global sort; safe at any SF.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey", "c_name", "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.asc("c_mktsegment"), F.desc("acctbal"), F.asc("c_custkey"))
        .limit(25)
    )


@register(
    "distinct_values",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
    tags=("distinct",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (hash-aggregate without agg functions)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_nationkey", "c_mktsegment").distinct().orderBy(
        "c_nationkey", "c_mktsegment"
    )


@register(
    "dedup_keep_first_by_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders
    ) t
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    tags=("distinct", "window", "dedup"),
)
def dedup_keep_first_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup-by-key: keep each customer's earliest order.

    `dropDuplicates(keys)` keeps an arbitrary row, which can't be oracled;
    the deterministic formulation (row_number over an explicit order) is
    what a production pipeline wants anyway.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey AS okey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey AS okey, 'big' AS src FROM orders WHERE o_totalprice > 400000
    ORDER BY okey, src
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (column-name-resolved, scale-safe)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("okey"), F.lit("urgent").alias("src")
    )
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("okey"), F.lit("big").alias("src")
    )
    return urgent.unionByName(big).orderBy("okey", "src")


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics; dedups both sides)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@register(
    "set_except_all",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    ORDER BY c_nationkey
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity-aware difference)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.exceptAll(b).orderBy("c_nationkey")


@register(
    "set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): unionByName + distinct — one dedup shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return a.unionByName(b).distinct().orderBy("o_custkey")


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_acctbal > 9000 AND c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_nationkey FROM customer WHERE c_acctbal > 9000 AND c_mktsegment = 'AUTOMOBILE'
    ORDER BY c_nationkey
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics — dedups, then anti-joins on the key).

    Predicates chosen so the difference is non-empty at sf0.01 — an
    empty result would vacuously match any oracle."""
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 9000)
    a = rich.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = rich.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.subtract(b).orderBy("c_nationkey")


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    ORDER BY c_nationkey
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min of the two multiplicities)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.intersectAll(b).orderBy("c_nationkey")


@register(
    "scd_upsert_classify",
    oracle="""
    WITH old AS (
      SELECT o_custkey AS key, arg_max(o_orderstatus, o_orderkey) AS status
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY o_custkey
    ), new AS (
      SELECT o_custkey AS key, arg_max(o_orderstatus, o_orderkey) AS status
      FROM orders
      GROUP BY o_custkey
    )
    SELECT CASE WHEN o.key IS NULL THEN 'insert'
                WHEN o.status <> n.status THEN 'update'
                ELSE 'unchanged' END AS change_type,
           COUNT(*) AS n_keys
    FROM new n LEFT JOIN old o ON n.key = o.key
    GROUP BY 1
    ORDER BY change_type
    """,
    tags=("upsert", "scd", "join", "maintenance"),
)
def scd_upsert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert / slowly-changing-dimension change detection: diff the
    current per-customer latest-order-status snapshot against the
    pre-1999 snapshot and classify every key as insert / update /
    unchanged — the MERGE INTO planning step of any warehouse load.

    Each snapshot is one max_by aggregate (deterministic version pick:
    highest order key); the diff is a single left join between two
    key-partitioned aggregates — at 100 TB both sides shuffle once on
    the same key, so AQE plans a co-partitioned join with no extra
    exchange."""
    orders = load_table(spark, sf_dir, "orders")
    old = (orders.filter(F.col("o_orderdate") < F.lit("1999-01-01"))
           .groupBy(F.col("o_custkey").alias("key"))
           .agg(F.max_by("o_orderstatus", "o_orderkey").alias("status")))
    new = (orders.groupBy(F.col("o_custkey").alias("key"))
           .agg(F.max_by("o_orderstatus", "o_orderkey").alias("status")))
    classified = (
        new.alias("n").join(old.alias("o"), "key", "left")
        .select(
            F.when(F.col("o.status").isNull(), "insert")
            .when(F.col("o.status") != F.col("n.status"), "update")
            .otherwise("unchanged").alias("change_type"))
    )
    return (classified.groupBy("change_type")
            .agg(F.count("*").alias("n_keys"))
            .orderBy("change_type"))


@register(
    "scd_merge_apply",
    oracle="""
    WITH target AS (
      SELECT o_custkey AS key, arg_max(o_orderstatus, o_orderkey) AS status
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY o_custkey
    ), source AS (
      SELECT o_custkey AS key, arg_max(o_orderstatus, o_orderkey) AS status
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(s.key, t.key) AS key,
           COALESCE(s.status, t.status) AS status,
           CASE WHEN s.key IS NOT NULL AND t.key IS NOT NULL THEN 'updated'
                WHEN s.key IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS origin
    FROM target t FULL OUTER JOIN source s ON t.key = s.key
    ORDER BY key
    """,
    tags=("upsert", "merge", "scd", "join", "maintenance"),
)
def scd_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO applied (the action step after scd_upsert_classify):
    the incoming snapshot upserts into the current dimension — matched
    keys take the source row, unmatched source keys insert, unmatched
    target keys survive — producing the post-merge table plus each
    row's origin.

    One full outer join between two key-partitioned aggregates; with an
    ACID table format this is the exact row set MERGE INTO would
    commit, so the engine-side semantics are format-independent."""
    orders = load_table(spark, sf_dir, "orders")

    def snapshot(cond):
        return (orders.filter(cond)
                .groupBy(F.col("o_custkey").alias("key"))
                .agg(F.max_by("o_orderstatus", "o_orderkey").alias("status")))

    cutoff = F.lit("1999-01-01").cast("timestamp")
    target = snapshot(F.col("o_orderdate") < cutoff)
    source = snapshot(F.col("o_orderdate") >= cutoff)
    t, s = target.alias("t"), source.alias("s")
    return (
        t.join(s, F.col("t.key") == F.col("s.key"), "full_outer")
        .select(
            F.coalesce("s.key", "t.key").alias("key"),
            F.coalesce("s.status", "t.status").alias("status"),
            F.when(F.col("s.key").isNotNull() & F.col("t.key").isNotNull(),
                   "updated")
            .when(F.col("s.key").isNotNull(), "inserted")
            .otherwise("kept").alias("origin"),
        )
        .orderBy("key")
    )
