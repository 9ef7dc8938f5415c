"""Join surface: outer variants, semi/anti, theta/range, cross, self, as-of.

SURVEY.md §2.C "Joins".  Strategy notes per query explain what Catalyst/AQE
picks and why it holds at scale: dimensions broadcast, facts shuffle on the
join key once, non-equi joins are kept on deliberately-small inputs (their
cost is inherently quadratic — at 100 TB you bound one side first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof_join import asof_join_backward
from .base import register


@register(
    "join_left_outer_nulls",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c_custkey = o_custkey
    ORDER BY c_custkey, o_orderkey NULLS FIRST
    """,
    tags=("join", "outer"),
)
def join_left_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join where the right side is filtered → real NULL rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .orderBy("c_custkey", F.asc_nulls_first("o_orderkey"))
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT big.o_custkey AS big_cust, urgent.o_custkey AS urgent_cust,
           big.n_big, urgent.n_urgent
    FROM (SELECT o_custkey, COUNT(*) AS n_big FROM orders
          WHERE o_totalprice > 350000 GROUP BY o_custkey) big
    FULL JOIN (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
               WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) urgent
      ON big.o_custkey = urgent.o_custkey
    ORDER BY big_cust NULLS FIRST, urgent_cust NULLS FIRST
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated views with disjoint-ish key sets."""
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey").agg(F.count("*").alias("n_big"))
        .withColumnRenamed("o_custkey", "big_cust")
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey").agg(F.count("*").alias("n_urgent"))
        .withColumnRenamed("o_custkey", "urgent_cust")
    )
    return (
        big.join(urgent, big.big_cust == urgent.urgent_cust, "full")
        .select("big_cust", "urgent_cust", "n_big", "n_urgent")
        .orderBy(F.asc_nulls_first("big_cust"), F.asc_nulls_first("urgent_cust"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the relational EXISTS. No row multiplication."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — NOT EXISTS; customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey, l_quantity, p_size
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
             AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("join", "theta"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: the equi key carries the hash join,
    the range predicate evaluates as a post-join filter — the scalable
    shape for mixed conditions (a pure theta join would be BNL)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey)
            & F.col("l_quantity").between(F.col("p_size") - 2, F.col("p_size") + 2),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey", "l_quantity", "p_size")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two bounded dimensions (5 × 25 rows).

    Cross joins are only ever issued on provably-small inputs; anything
    unbounded goes through candidate generation (see llm_similarity)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_self_pairs",
    oracle="""
    SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b, a.n_regionkey AS regionkey
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey < b.n_nationkey
    ORDER BY nk_a, nk_b
    """,
    tags=("join", "self"),
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: unordered pairs of nations in the same region.

    The `<` predicate halves the pair space and dedups symmetric pairs —
    the same trick the near-dup pipelines use at scale."""
    nation = load_table(spark, sf_dir, "nation")
    a = nation.alias("a")
    b = nation.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_nationkey").alias("nk_a"),
            F.col("b.n_nationkey").alias("nk_b"),
            F.col("a.n_regionkey").alias("regionkey"),
        )
        .orderBy("nk_a", "nk_b")
    )


@register(
    "join_asof_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS click_ts, ROUND(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY purchase_id
    """,
    tags=("join", "asof", "custom-operator"),
)
def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join — an operator Spark lacks natively.

    For each purchase event, the most recent click by the same user at or
    before the purchase.  Implemented in operators/asof_join.py as a
    union + window (`last` ignoring nulls) — one shuffle on (user_id, ts),
    no row explosion, scale-safe.  Oracle uses DuckDB's native ASOF JOIN.
    """
    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase")
    right = events.filter(F.col("event_type") == "click")
    joined = asof_join_backward(
        left, right,
        on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"ts": "click_ts"},
    )
    return (
        joined.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_ts",
            F.round("value", 2).alias("purchase_value"),
        )
        .orderBy("purchase_id")
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "skew", "salt", "custom-operator"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted (8-way) equi-join: orders ⋈ customer on custkey.

    The salt scatters any hot custkey across 8 shuffle partitions while
    the customer side replicates 8×; the oracle is the plain join — the
    salt must be invisible in the result (operators/salted_join.py)."""
    from ..operators.salted_join import salted_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey")
    return (
        salted_join(orders, cust, on="custkey", salt=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "bucketing", "colocated", "storage"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through bucketed storage: both tables written
    bucketed by orderkey (8 buckets), then joined shuffle-free — bucket i
    of lineitem reads against bucket i of orders directly.  The oracle is
    the plain join; tests/test_plans.py asserts the zero-Exchange plan
    (operators/bucketing.py)."""
    from ..operators.bucketing import bucketed_join, write_bucketed

    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lt, ot = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    write_bucketed(load_table(spark, sf_dir, "lineitem")
                   .withColumnRenamed("l_orderkey", "orderkey"),
                   lt, "orderkey", 8)
    write_bucketed(load_table(spark, sf_dir, "orders")
                   .withColumnRenamed("o_orderkey", "orderkey"),
                   ot, "orderkey", 8)
    return (
        bucketed_join(spark, lt, ot, "orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"),
             F.round(F.sum("l_extendedprice"), 2).alias("total_price"))
        .orderBy("o_orderpriority")
    )


@register(
    "join_fuzzy_levenshtein",
    oracle="""
    SELECT a.p_brand AS brand,
           a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND a.p_name <> b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY brand, key_a, key_b
    """,
    tags=("join", "fuzzy", "similarity", "text"),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: near-identical part names (edit distance
    <= 3) within the same brand — the classic entity-resolution /
    catalog-dedup shape.

    The block key (p_brand) turns the quadratic all-pairs comparison
    into an equi hash join; the Levenshtein predicate runs as a
    post-join filter on JVM codegen (`levenshtein` is built-in — no
    UDF).  At 100 TB the block key is the standard lever: smaller blocks
    (brand x size, or a q-gram prefix) bound the per-bucket pair count
    exactly like LSH banding does for MinHash."""
    part = load_table(spark, sf_dir, "part")
    a = part.select(F.col("p_brand").alias("brand"),
                    F.col("p_partkey").alias("key_a"),
                    F.col("p_name").alias("name_a"))
    b = part.select(F.col("p_brand").alias("brand"),
                    F.col("p_partkey").alias("key_b"),
                    F.col("p_name").alias("name_b"))
    return (
        a.join(b, "brand")
        .filter((F.col("key_a") < F.col("key_b"))
                & (F.col("name_a") != F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("brand", "key_a", "key_b", "name_a", "name_b", "dist")
        .orderBy("brand", "key_a", "key_b")
    )
