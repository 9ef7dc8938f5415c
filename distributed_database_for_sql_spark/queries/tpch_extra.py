"""Remaining TPC-H-style analogues (Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q19/Q20/Q21/Q22).

The driver's star schema is TPC-H-ish but slimmer than the spec (no
partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no c_phone —
/root/repo/FIXTURES.md), so each query here is the closest analogue that
exercises the same *operator shape* as its namesake: EXISTS→semi-join
(Q4), nation-pair disjunction (Q7), market-share ratio (Q8), profit
expression (Q9), HAVING against a global scalar (Q11), outer-join
distribution (Q13), scalar-subquery max (Q15), grouped countDistinct with
NOT IN (Q16), correlated per-group average (Q17), disjunctive multi-column
DNF predicate pushdown (Q19), sole-late-supplier semi/anti pair (Q21),
anti-join against a scalar threshold (Q22), min-cost supplier with a
per-part window minimum (Q2), delay-window priority mix (Q12), and
excess-share suppliers via windowed totals + semi-join (Q20).

The reference's command log was built to carry exactly these statement
strings but never executes them (/root/reference/src/raft/node.go:16-19,
/root/reference/src/raft/replication.go:98); here they run through
Catalyst.  Scale notes are per-query: dimensions broadcast, fact-fact
joins shuffle on their join key only, and every derived "small" side
(post-HAVING key sets, per-group averages) is either genuinely reduced
(AQE broadcasts it) or explicitly marked broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "agg", "exists"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: EXISTS decorrelated to a left-semi join.

    Lateness predicate is l_shipdate > o_orderdate + 60 days (the schema
    has no l_commitdate).  The semi join shuffles both sides on orderkey
    once; the date filter prunes orders before the shuffle.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "disjunction"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue: bilateral trade volume between two nations by year.

    nation joins twice under different aliases (supplier side / customer
    side); the nation-pair disjunction filters AFTER both are attached.
    All dimensions broadcast — lineitem⋈orders is the only shuffle.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "conditional", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: one nation's share of regional ECONOMY-part revenue.

    Conditional-sum ratio inside a single aggregate — one pass, no
    self-join.  Eight-table star: every dimension broadcasts, the two
    fact tables shuffle once on orderkey.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", volume)
        .groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                  .otherwise(F.lit(0.0))) / F.sum("volume"), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "like"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit on widget-like parts by supplier nation/year.

    Cost proxy is 0.6×p_retailprice×l_quantity (the schema has no
    ps_supplycost).  The LIKE filter on the broadcast part side prunes
    lineitem rows at the join, before any shuffle.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("long").alias("o_year"),
                amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_suppkey, SUM(l_extendedprice * l_quantity) AS raw_value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, ROUND(raw_value, 2) AS value
    FROM v
    WHERE raw_value > (SELECT AVG(raw_value) * 1.05 FROM v)
    ORDER BY value DESC, l_suppkey
    """,
    tags=("agg", "having", "scalar-subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: suppliers holding above-average inventory value.

    HAVING against a global scalar, kept scale-invariant: the threshold is
    105% of the mean per-supplier value (a fixed share of total would
    silently go empty as supplier count grows with SF).  The scalar is a
    one-row aggregate broadcast into the filter — two passes over a
    map-side-combined agg, no driver-side collect.
    """
    li = _t(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(value).alias("raw_value"))
    total = per_supp.agg((F.avg("raw_value") * 1.05).alias("threshold"))
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("l_suppkey", F.round(F.col("raw_value"), 2).alias("value"))
        .orderBy(F.desc("value"), "l_suppkey")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "agg", "distribution"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: distribution of non-urgent order counts per customer.

    The left outer join keeps zero-order customers (COUNT of a NULL key is
    0); the second aggregate is over ≤|customers| rows, trivially cheap.
    At scale the first agg shuffles on custkey — same key as the join, so
    AQE reuses the partitioning.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "scalar-subquery", "cte"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: supplier(s) with max quarterly revenue.

    The revenue CTE is computed once and reused for both the max scalar
    and the join (Spark dedups via plan reuse after .cache-free
    self-reference; at |suppliers| rows both sides are tiny).
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("raw_revenue"))
    )
    max_rev = revenue.agg(F.max("raw_revenue").alias("max_revenue"))
    return (
        supp.join(revenue, supp.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("raw_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name",
                F.round(F.col("raw_revenue"), 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "distinct", "in"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct suppliers per surviving part bucket.

    NOT-equals + IN-list predicates evaluate on the broadcast part side
    before the join; countDistinct expands to a two-phase partial
    aggregate, so the shuffle key is (brand, type, size, suppkey).
    """
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS a_partkey, 0.5 * AVG(l_quantity) AS qty_limit
          FROM lineitem GROUP BY l_partkey) pa
      ON p_partkey = a_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < qty_limit
    """,
    tags=("join", "agg", "correlated"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: revenue from below-half-average-quantity orders.

    The correlated scalar subquery (per-part avg quantity) is decorrelated
    into an aggregate + join — the per-part aggregate is |parts| rows, so
    AQE broadcasts it against the fact scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.avg("l_quantity") * 0.5).alias("qty_limit"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), part.p_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("join", "filter", "disjunction"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue: three-branch DNF predicate across both join sides.

    Catalyst extracts the common l_quantity bounds [1, 40] as a
    pushdown-able conjunct on the scan; the full disjunction evaluates
    post-join.  part broadcasts, so no shuffle at all.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand) & F.col("p_size").between(1, smax)
        & (q >= qlo) & (q <= qhi)
    )
    cond = (branch("Brand#1", 15, 1, 21) | branch("Brand#2", 25, 10, 30)
            | branch("Brand#3", 35, 20, 40))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("join", "semi", "anti", "exists", "agg"),
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: sole late supplier on multi-supplier finished orders.

    EXISTS/NOT EXISTS become one self-aggregate on lineitem: per
    (orderkey) count distinct suppliers and distinct *late* suppliers,
    then the predicate pair is (suppliers > 1) AND (late suppliers == 1)
    AND (this supplier is late).  One shuffle on orderkey replaces two
    correlated subqueries — the same decorrelation Catalyst would emit,
    expressed directly.
    """
    li = _t(spark, sf_dir, "lineitem")
    # The `flagged` frame is referenced twice (per-order counts + the
    # final supplier roll-up); broadcasting the FILTERED 2-column orders
    # projection makes both references map-side joins over a pruned
    # 3-column lineitem scan — lineitem never shuffles for the join, and
    # the only wide shuffle left is the per-order aggregate.  (The
    # filtered orders key+date projection is a fraction of the fact side
    # at any SF; if it ever outgrows the broadcast threshold, dropping
    # the hint falls back to one shuffle join, not two — the frame should
    # then be persisted instead.)
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    supp = _t(spark, sf_dir, "supplier")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    flagged = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .withColumn("is_late", (F.col("l_shipdate") > late_cut).cast("int"))
    )
    per_order = (
        flagged.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey")))
            .alias("n_late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_orderkey")
    )
    return (
        flagged.filter(F.col("is_late") == 1)
        .join(per_order.withColumnRenamed("l_orderkey", "ok"),
              F.col("l_orderkey") == F.col("ok"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("anti", "scalar-subquery", "agg"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue: rich customers with no recent orders, by nation.

    Scalar threshold broadcast + left-anti join against recent orders.
    The anti join shuffles on custkey; customer-side filter applies first
    so only above-average customers shuffle at all.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), regional AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost
      FROM cost c
      JOIN supplier s ON c.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT p.p_partkey, c.l_suppkey AS s_suppkey,
           ROUND(c.unit_cost, 2) AS unit_cost
    FROM regional c JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_size <= 10
      AND c.unit_cost = (SELECT MIN(c2.unit_cost) FROM regional c2
                         WHERE c2.l_partkey = c.l_partkey)
    ORDER BY p_partkey, s_suppkey
    """,
    tags=("join", "window", "correlated-subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue: per part, the cheapest in-region supplier.

    With no partsupp table the unit cost is MIN(l_extendedprice) per
    (part, supplier) — an exact double, so the min-equality keeps ties
    deterministically on both engines.  The correlated scalar subquery
    becomes a window MIN over the part key: one shuffle on l_partkey,
    dimensions broadcast, no per-row re-aggregation.
    """
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)

    asia_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey")
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("unit_cost"))
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = W.partitionBy("l_partkey")
    return (
        cost.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", F.col("l_suppkey").alias("s_suppkey"),
                F.round("unit_cost", 2).alias("unit_cost"))
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q12_shipping_delay_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE date_diff('day', o_orderdate, l_shipdate) BETWEEN 30 AND 90
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: priority mix of 30-90-day-delayed shipments.

    No l_shipmode/commitdate columns, so the delay window plays the
    receipt-window role and l_linestatus stands in for shipmode; the
    operator shape is the same — fact-fact equi join plus conditional
    SUM(CASE) aggregation, one shuffle on the group key.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(delay.between(30, 90))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH share AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS sq,
             SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey) AS total
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier JOIN share ON s_suppkey = l_suppkey
    WHERE sq > 0.15 * total
    ORDER BY s_suppkey
    """,
    tags=("join", "window", "semi", "tpch"),
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: suppliers holding an outsized share of a part.

    availqty is gone with partsupp, so "excess stock" becomes shipping
    >15% of a PROMO part's total quantity.  Same shape as the original's
    nested IN: per-(supplier, part) aggregate, a per-part total (window
    SUM over the same shuffle — no second aggregation pass), then a
    semi-join into supplier.  l_quantity values are small integers, so
    the double sums are exact and the share comparison is engine-stable.
    """
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    share = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .withColumn("total", F.sum("sq").over(W.partitionBy("l_partkey")))
        .filter(F.col("sq") > 0.15 * F.col("total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(share, supp.s_suppkey == share.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
