"""Aggregation surface: multi-key, HAVING, distinct, grouping sets, pivot,
statistics, percentiles, approx sketches (SURVEY.md §2.C "Aggregations").

Spark's hash aggregate is partial+final automatically (map-side combine),
so every groupBy here ships |groups| rows per partition, not |rows| —
the property that makes these plans hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    ORDER BY o_custkey
    """,
    tags=("agg", "having"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_supp,
           COUNT(DISTINCT l_partkey)  AS n_part,
           COUNT(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (expand + two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # HLL sketches differ across engines; exactness checked in tests
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-scale cardinality
    path: constant memory per group vs. the exact expand-shuffle.

    Rows-only driver check; tests/test_aggregates.py bounds its error
    against the exact count (rsd 5%)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.05).alias("approx_orders"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING id to tag subtotal levels."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy(
            "gid",
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 2^2 grouping sets in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
        .orderBy(
            "gid",
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


@register(
    "agg_global_stats",
    oracle="""
    SELECT COUNT(*)                               AS n,
           ROUND(MIN(l_extendedprice), 2)         AS min_price,
           ROUND(MAX(l_extendedprice), 2)         AS max_price,
           ROUND(AVG(l_extendedprice), 4)         AS avg_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
           ROUND(VAR_SAMP(l_discount), 6)         AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem
    """,
    tags=("agg", "stats"),
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand aggregate with moment-based statistics (single-pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4)  AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p95) per group.

    At 100 TB you'd switch to `percentile_approx` (t-digest-style sketch,
    mergeable, bounded memory) — kept exact here for oracle parity; the
    approx variant is exercised in tests."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_F,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra distinct-values pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return (
        piv.select(
            "l_returnflag",
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT p_partkey, metric, ROUND(val, 2) AS value
    FROM (
      SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size',  CAST(p_size AS DOUBLE)    AS val FROM part
    ) u
    ORDER BY p_partkey, metric
    """,
    tags=("agg", "unpivot"),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long) via the stack() generator — one scan, no join."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.expr(
                "stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE))"
            ).alias("metric", "val"),
        )
        .select("p_partkey", "metric", F.round("val", 2).alias("value"))
        .orderBy("p_partkey", "metric")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "grouping-sets", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over) —
    three simultaneous grouping levels in one shuffle: Spark expands the
    sets via a single Expand node, so the input is scanned once."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5)  AS p50,
           quantile_disc(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "sketch"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approx_percentile, hash-matched against DuckDB's
    exact discrete quantile.

    GK's rank error is bounded by n/accuracy; at the oracle's group sizes
    accuracy=100000 makes the sketch exact, so the match is not luck.  At
    100 TB the same one-pass mergeable sketch keeps running (error grows
    gracefully) where an exact per-group sort would not — that is the
    point of shipping the sketch instead of `percentile`."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 100000)").alias("p50"),
            F.expr("approx_percentile(l_extendedprice, 0.95, 100000)").alias("p95"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sample_seeded",
    oracle=None,  # engine-specific RNG; determinism + bounds pinned by pytest
    tags=("sample", "rows-only"),
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli TABLESAMPLE with a fixed seed: reproducible downsampling.

    sample() filters per row with a seeded per-partition RNG — no shuffle,
    no collect, fraction-proportional cost at any scale (the standard way
    to cut a 100 TB corpus to a pilot slice).  Cross-engine RNGs differ,
    so the driver records rows-only; tests/test_operators.py pins
    determinism and fraction bounds."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.sample(fraction=0.1, seed=42)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("o_orderkey")
    )


@register(
    "sample_seeded_det",
    # Engine-portable deterministic Bernoulli: a row is kept iff the
    # first 4 hex chars of md5(key || salt) fall under the fraction
    # threshold (0.1 → 0x199A/0x10000).  Fixed-length lowercase hex
    # compares lexicographically == numerically, and both engines emit
    # identical md5 hex — so the KEPT SET (not just its size) is
    # hash-certified, the oracled twin of the rows-only sample_seeded.
    oracle="""
    SELECT COUNT(*)                        AS n_sampled,
           MIN(o_orderkey)                 AS min_key,
           MAX(o_orderkey)                 AS max_key,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || '#seed42'), 1, 4)
          < '199a'
    """,
    tags=("sample", "deterministic", "hash-bernoulli"),
)
def sample_seeded_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample by hash threshold (VERDICT r6
    item 5): scan-time row-local filter, zero shuffle, zero RNG — the
    same rows are kept on any engine, any partitioning, any run, which
    is what makes a 100 TB pilot slice CACHEABLE and auditable
    downstream (the seeded-RNG sample_seeded stays the Spark-native
    variant; its kept set is engine-specific by construction)."""
    orders = load_table(spark, sf_dir, "orders")
    hx = F.substring(
        F.md5(F.concat(F.col("o_orderkey").cast("string"),
                       F.lit("#seed42"))), 1, 4)
    return (
        orders.filter(hx < "199a")
        .agg(F.count("*").alias("n_sampled"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"),
             F.sum("o_orderkey").cast("bigint").alias("key_checksum"))
    )


@register(
    "agg_argmax_struct",
    oracle="""
    SELECT c_mktsegment,
           ROUND(max(struct_pack(bal := c_acctbal, ck := c_custkey)).bal, 2)
             AS top_bal,
           max(struct_pack(bal := c_acctbal, ck := c_custkey)).ck AS top_cust
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("agg", "argmax"),
)
def agg_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic arg-max per group via max(struct(value, key)):
    lexicographic struct comparison makes the key a built-in tie-break,
    unlike max_by/arg_max whose tie winner is engine-defined.  One
    map-side-combined aggregate — the grouped top-1 without a window."""
    cust = load_table(spark, sf_dir, "customer")
    top = F.max(F.struct(F.col("c_acctbal").alias("bal"),
                         F.col("c_custkey").alias("ck")))
    return (
        cust.groupBy("c_mktsegment")
        .agg(top.alias("t"))
        .select(
            "c_mktsegment",
            F.round(F.col("t.bal"), 2).alias("top_bal"),
            F.col("t.ck").alias("top_cust"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "stats_table_profile",
    # ANALYZE-style stats: one pass, all integers (sums in cents /
    # quantities are exact 2-decimal data).
    oracle="""
    SELECT COUNT(*)                                        AS n_rows,
           COUNT(DISTINCT l_orderkey)                      AS ndv_orderkey,
           COUNT(DISTINCT l_partkey)                       AS ndv_partkey,
           COUNT(DISTINCT l_suppkey)                       AS ndv_suppkey,
           CAST(MIN(l_quantity) AS BIGINT)                 AS min_qty,
           CAST(MAX(l_quantity) AS BIGINT)                 AS max_qty,
           CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_price_cents,
           COUNT(*) - COUNT(l_returnflag)                  AS nulls_returnflag,
           COUNT(DISTINCT l_returnflag)                    AS ndv_returnflag
    FROM lineitem
    """,
    tags=("stats", "profile", "aggregate", "diagnostics"),
)
def stats_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style statistics collection over lineitem: row
    count, per-column NDV, min/max, null counts, value totals — the
    stats a cost-based optimizer (or a data-quality monitor) gathers
    before planning joins.

    One full-scan aggregate; the distinct counts are the only
    shuffle-heavy part (each is a partial-distinct tree).  At 100 TB
    you'd swap COUNT(DISTINCT) for approx_count_distinct — kept exact
    here so the oracle hashes byte-identically."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("ndv_orderkey"),
        F.countDistinct("l_partkey").alias("ndv_partkey"),
        F.countDistinct("l_suppkey").alias("ndv_suppkey"),
        F.min("l_quantity").cast("bigint").alias("min_qty"),
        F.max("l_quantity").cast("bigint").alias("max_qty"),
        F.round(F.sum("l_extendedprice") * 100).cast("bigint")
         .alias("sum_price_cents"),
        (F.count("*") - F.count("l_returnflag")).alias("nulls_returnflag"),
        F.countDistinct("l_returnflag").alias("ndv_returnflag"),
    )


@register(
    "agg_hll_sketch_mergeable",
    # The oracle certifies the EXACT counts and emits the tolerance flag
    # as TRUE; Spark computes the flag from its actual HLL estimates
    # (default lgConfigK=12 → ~1.6% rel. error, far inside the 5% gate),
    # so a hash match proves the sketch estimates really landed within
    # tolerance of the exact counts — per shard AND after the merge.
    oracle="""
    SELECT grp, n_exact, hll_within_5pct FROM (
      SELECT o_orderpriority AS grp,
             COUNT(DISTINCT o_custkey) AS n_exact,
             TRUE AS hll_within_5pct
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT 'ALL' AS grp,
             COUNT(DISTINCT o_custkey) AS n_exact,
             TRUE AS hll_within_5pct
      FROM orders
    ) ORDER BY grp
    """,
    tags=("aggregate", "sketch", "hll", "mergeable", "approx"),
)
def agg_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Spark's Apache DataSketches
    builtins): one HLL sketch per priority shard, then the GLOBAL
    distinct count from ``hll_union_agg`` over the per-shard sketches —
    no re-scan of the data.  That mergeability is the 100 TB pattern:
    executors sketch their shards independently, the union is
    bytes-sized, and a rolled-up distinct costs a sketch merge instead
    of a global COUNT(DISTINCT) shuffle.  Exact counts ride along so
    the oracle hash certifies the estimates stayed within 5%."""
    orders = load_table(spark, sf_dir, "orders")
    per = (orders.groupBy(F.col("o_orderpriority").alias("grp"))
           .agg(F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
                F.count_distinct("o_custkey").alias("n_exact")))
    shard = per.select(
        "grp", "n_exact",
        F.expr("hll_sketch_estimate(sk)").alias("est"))
    merged = (per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .crossJoin(orders.agg(
            F.count_distinct("o_custkey").alias("n_exact")))
        .select(F.lit("ALL").alias("grp"), "n_exact", "est"))
    within = (F.abs(F.col("est") - F.col("n_exact"))
              <= 0.05 * F.col("n_exact"))
    return (shard.unionByName(merged)
            .select("grp", "n_exact", within.alias("hll_within_5pct"))
            .orderBy("grp"))


@register(
    "scaling_probe_hash_mix",
    oracle="""
    -- DuckDB's range() only takes constants, so the 0..1024*|lineitem|-1
    -- index stream is built as row_number x constant-range: any
    -- bijection onto the index set yields the same aggregate.
    WITH li AS (SELECT row_number() OVER () - 1 AS r FROM lineitem),
    n AS (SELECT COUNT(*) AS cnt FROM lineitem),
    seq AS (
      SELECT r + (SELECT cnt FROM n) * j.range AS i
      FROM li CROSS JOIN range(1024) AS j
    ),
    mixed AS (
      SELECT ((((i * 2654435761) % 1000000007) * 22695477 + i)
              % 998244353) * 1099087573 % 1000000007 AS h
      FROM seq
    )
    SELECT h % 8 AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS h_sum
    FROM mixed
    GROUP BY h % 8
    ORDER BY bucket
    """,
    tags=("bench", "scaling", "agg"),
)
def scaling_probe_hash_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaling-sensitive bench probe (VERDICT r14 item 2): at sf0.1 every
    headline query is overhead-bound (0.13–1.4 s), so the driver's
    8-vs-32-core ratios read ≈1 and scaling is unobservable.  This probe
    carries seconds of genuinely parallel compute — an input-size-derived
    row count (1024 rows per lineitem row) through an exact integer
    hash-mix (multiply/add/mod chains, overflow-free in BIGINT on both
    engines) and a two-level aggregation — so the core-count ratio is a
    real signal.  Deterministic and DuckDB-oracled like every query."""
    n = load_table(spark, sf_dir, "lineitem").count() * 1024
    i = F.col("id")
    h = (i * F.lit(2654435761)) % F.lit(1000000007)
    h = (h * F.lit(22695477) + i) % F.lit(998244353)
    h = (h * F.lit(1099087573)) % F.lit(1000000007)
    return (spark.range(n)
            .select((h % 8).alias("bucket"), h.alias("h"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("h").alias("h_sum"))
            .orderBy("bucket"))
