"""Graph / diagnostic queries: fixed-iteration PageRank over a trade
graph, and key-skew diagnostics.

Iterative graph algorithms are the classic "beyond one SQL statement"
workload; operators/pagerank.py runs them as a DataFrame loop whose
fixed unrolling a DuckDB chained-CTE oracle can recompute exactly.  The
skew profiler is the operational tool every 100 TB pipeline needs before
picking join strategies (salting thresholds, AQE skew hints).

The reference implements no operators at all (SURVEY.md §2.A — a Go
Raft core); these extend the §2.C target surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register

# Shared edge definition: supplier-nation -> customer-nation trade edges
# weighted by lineitem count (integer weights => the oracle's arithmetic
# matches bit-for-bit until the final quantized division).
_EDGES_SQL = """
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS weight
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY s.s_nationkey, c.c_nationkey
"""

_PR_ITER_SQL = """
    , r{K} AS (
      SELECT nd.node,
             (1.0 - 0.85) / (SELECT nn FROM n)
             + 0.85 * COALESCE(s.msum, 0.0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT t.dst AS node, SUM(r.rank * t.p) AS msum
        FROM trans t JOIN r{P} r ON r.node = t.src
        GROUP BY t.dst
      ) s ON nd.node = s.node
    )
"""


def _pagerank_oracle(iterations: int) -> str:
    iters = "".join(
        _PR_ITER_SQL.format(K=k, P=k - 1) for k in range(1, iterations + 1))
    return f"""
    WITH edges AS ({_EDGES_SQL}
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes
    ), outw AS (
      SELECT src, SUM(weight) AS ow FROM edges GROUP BY src
    ), trans AS (
      SELECT e.src, e.dst, e.weight / o.ow AS p
      FROM edges e JOIN outw o ON e.src = o.src
    ), r0 AS (
      SELECT node, 1.0 / (SELECT nn FROM n) AS rank FROM nodes
    ){iters}
    SELECT na.n_name AS nation,
           CAST(FLOOR(r.rank * 1000000 + 0.5) AS BIGINT) AS rank_micro
    FROM r{iterations} r JOIN nation na ON na.n_nationkey = r.node
    ORDER BY rank_micro DESC, nation
    """


@register(
    "graph_pagerank_trade",
    # 3 unrolled iterations; ranks quantized to 1e-6 (cross-engine
    # double-summation order differs by ~1e-15 relative — far below the
    # quantum).  Integer edge weights keep everything upstream exact.
    oracle=_pagerank_oracle(3),
    tags=("graph", "iterative", "pagerank", "join"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, damping 0.85) over the
    supplier-nation -> customer-nation trade graph (operators/
    pagerank.py): which nations sit at the center of the trade flow.

    The edge build is three broadcast-dim joins + one count aggregate;
    each PageRank iteration is one join + one aggregate over the tiny
    transition table, all unrolled into a single lazy plan — no driver
    loop over collected data, no lineage checkpointing needed at 3
    iterations."""
    from ..operators.pagerank import pagerank_fixed

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    # Narrow every side to the join/agg columns BEFORE joining (the scans
    # then read 2 columns each), and broadcast orders' 2-column projection
    # too: after pruning it is dimension-sized at any SF where it fits the
    # broadcast threshold, and broadcasting it removes the only big-to-big
    # shuffle in the edge build (lineitem never repartitions — each task
    # map-side joins three broadcast tables and feeds the partial count
    # aggregate).  At a scale where even the 2-column orders projection
    # exceeds the threshold, drop that one hint and AQE falls back to a
    # shuffle join on o_orderkey; the other two dims stay broadcast.
    edges = (
        li.select("l_suppkey", "l_orderkey")
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("s_nationkey").alias("src"),
                 F.col("c_nationkey").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )
    ranks = pagerank_fixed(edges, "src", "dst", "weight",
                           iterations=3, damping=0.85)
    return (
        ranks.join(F.broadcast(nation),
                   ranks["node"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.floor(F.col("rank") * 1000000 + F.lit(0.5)).cast("bigint")
             .alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "nation")
    )


@register(
    "stats_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT SUM(cnt) AS n, COUNT(*) AS k, MAX(cnt) AS mx FROM per_key
    )
    SELECT key, cnt,
           CAST(cnt * 1000 // (SELECT n FROM tot) AS BIGINT) AS permille,
           CAST(cnt * (SELECT k FROM tot) * 100 // (SELECT n FROM tot)
                AS BIGINT) AS x_mean_pct
    FROM per_key
    ORDER BY cnt DESC, key
    LIMIT 10
    """,
    tags=("diagnostics", "skew", "aggregate"),
)
def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: the top-10 heaviest orders.o_custkey keys
    with their share (permille of all rows) and hotness relative to the
    mean key (percent, 100 = exactly average).  This is the diagnostic
    that decides salting / AQE-skew-join thresholds before running a big
    join at 100 TB.

    One hash aggregate + a TakeOrdered top-k; the totals are a
    broadcast scalar.  All outputs integer-exact."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = (orders.groupBy(F.col("o_custkey").alias("key"))
               .agg(F.count("*").alias("cnt")))
    tot = per_key.agg(
        F.sum("cnt").alias("n"), F.count("*").alias("k")).collect()[0]
    n, k = int(tot["n"]), int(tot["k"])
    return (
        per_key.select(
            "key", "cnt",
            F.expr(f"cnt * 1000 div {n}").alias("permille"),
            F.expr(f"cnt * {k} * 100 div {n}").alias("x_mean_pct"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(10)
    )


_ZBITS = 11  # covers p_partkey < 2048 at oracle SF; wider at scale


def _z_expr(x: str, y: str, spark_side: bool) -> str:
    """Bit-interleaved Morton/Z-value of two integer columns, emitted as
    a plain arithmetic sum so Spark SQL and DuckDB compute it
    identically (Spark spells shift as shiftright(), DuckDB as >>)."""
    terms = []
    for b in range(_ZBITS):
        if spark_side:
            xs, ys = f"shiftright({x}, {b})", f"shiftright({y}, {b})"
        else:
            xs, ys = f"({x} >> {b})", f"({y} >> {b})"
        terms.append(f"({xs} & 1) * {1 << (2 * b)}")
        terms.append(f"({ys} & 1) * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_clustering",
    # Everything is integer bit arithmetic + ntile over a unique order —
    # engine-exact.  The evidence of clustering: per z-bucket min/max
    # spans of BOTH dims stay bounded, which is exactly why z-ordered
    # parquet row groups prune on 2-D predicates.
    oracle=f"""
    WITH z AS (
      SELECT p_partkey, p_size,
             {_z_expr('p_partkey', 'p_size', False)} AS zval
      FROM part
    ), bucketed AS (
      SELECT p_partkey, p_size, zval,
             NTILE(16) OVER (ORDER BY zval, p_partkey) AS zbucket
      FROM z
    )
    SELECT zbucket, COUNT(*) AS n,
           MIN(p_partkey) AS key_lo, MAX(p_partkey) AS key_hi,
           MIN(p_size) AS size_lo, MAX(p_size) AS size_hi
    FROM bucketed
    GROUP BY zbucket
    ORDER BY zbucket
    """,
    tags=("layout", "zorder", "clustering", "diagnostics"),
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering for multi-dimensional data skipping:
    interleave the bits of (p_partkey, p_size), split the z-sorted
    stream into 16 equal buckets (stand-ins for files/row groups), and
    report each bucket's min/max span in BOTH dimensions — the zone-map
    evidence that 2-D box predicates prune z-ordered layouts, which a
    single-column sort cannot give for the second dimension.

    At 100 TB this is `repartitionByRange(zval) + sortWithinPartitions`
    before the parquet write; here ntile stands in for the range
    partitioner because its bucket boundaries are deterministic (the
    range partitioner samples)."""
    part = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window as W

    z = part.select(
        "p_partkey", "p_size",
        F.expr(_z_expr("p_partkey", "p_size", True)).alias("zval"))
    w = W.orderBy("zval", "p_partkey")
    return (
        z.withColumn("zbucket", F.ntile(16).over(w))
        .groupBy("zbucket")
        .agg(F.count("*").alias("n"),
             F.min("p_partkey").alias("key_lo"),
             F.max("p_partkey").alias("key_hi"),
             F.min("p_size").alias("size_lo"),
             F.max("p_size").alias("size_hi"))
        .orderBy("zbucket")
    )
