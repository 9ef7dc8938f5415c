"""Scalar function library: string, date/time, math, array, map, JSON,
conditional (SURVEY.md §2.C "Scalar function library").

Everything is a built-in `pyspark.sql.functions` expression — JVM-side,
inside whole-stage codegen; no Python in the row path.  Oracle SQL uses the
DuckDB spelling of the same function where names differ (instr→strpos,
log→ln, get_json_object→json_extract_string, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .base import register


@register(
    "fn_string_suite",
    oracle="""
    SELECT doc_id,
           UPPER(SUBSTRING(text, 1, 10))                    AS head_uc,
           LOWER(source)                                    AS src_lc,
           LENGTH(text)                                     AS text_len,
           TRIM(CONCAT('  ', lang, '  '))                   AS lang_trim,
           STRPOS(text, 'data')                             AS data_pos,
           REPLACE(SUBSTRING(text, 1, 20), ' ', '_')        AS head_snake,
           REGEXP_EXTRACT(text, '([a-z]+)', 1)              AS first_word,
           REGEXP_REPLACE(SUBSTRING(text, 1, 20), '[aeiou]', '*', 'g') AS devoweled,
           LPAD(CAST(doc_id AS VARCHAR), 6, '0')            AS padded_id,
           REVERSE(lang)                                    AS lang_rev,
           SPLIT_PART(text, ' ', 1)                         AS first_token
    FROM documents
    ORDER BY doc_id
    """,
    tags=("function", "string"),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions end-to-end on the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.upper(F.substring("text", 1, 10)).alias("head_uc"),
            F.lower("source").alias("src_lc"),
            F.length("text").alias("text_len"),
            F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
            F.instr("text", "data").alias("data_pos"),
            F.regexp_replace(F.substring("text", 1, 20), " ", "_").alias("head_snake"),
            F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
            F.regexp_replace(F.substring("text", 1, 20), "[aeiou]", "*").alias("devoweled"),
            F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
            F.reverse("lang").alias("lang_rev"),
            F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year  FROM o_orderdate)                       AS yr,
           EXTRACT(month FROM o_orderdate)                       AS mo,
           EXTRACT(day   FROM o_orderdate)                       AS dy,
           EXTRACT(quarter FROM o_orderdate)                     AS qtr,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)   AS month_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)     AS plus3mo,
           CAST(EPOCH(o_orderdate) AS BIGINT)                    AS epoch_s
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    tags=("function", "datetime"),
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction, truncation, arithmetic, epoch conversion."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dy"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            # TIMESTAMP, not DATE: DuckDB's .df() renders DATE columns as
            # midnight datetime64 while Spark's toPandas keeps date objects
            # — typing both sides TIMESTAMP makes the canonical reprs agree.
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            F.datediff(F.lit("2000-01-01").cast("date"),
                       F.col("o_orderdate").cast("date")).cast("long").alias("days_to_y2k"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus3mo"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_math_suite",
    # Every double-typed output is quantized to BIGINT with FLOOR(x*scale
    # [+0.5]) rather than ROUND: Spark rounds doubles through BigDecimal of
    # the shortest decimal repr (half-up) while DuckDB rounds numerically,
    # so ROUND(double, n) is not bitwise-reproducible across the two
    # engines (this failed the r3 driver hash). *, /, FLOOR, and the
    # correctly-rounded SQRT are identical IEEE ops on both sides.
    oracle="""
    SELECT p_partkey,
           CAST(FLOOR(p_retailprice * 10 + 0.5) AS BIGINT)          AS price_decis,
           ABS(p_size - 25)                                         AS size_dev,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT)               AS price_bucket,
           CAST(CEIL(p_retailprice / 100) AS BIGINT)                AS price_bucket_up,
           CAST(POW(p_size, 2) AS BIGINT)                           AS size_sq,
           CAST(FLOOR(SQRT(p_retailprice) * 100) AS BIGINT)         AS price_sqrt_c,
           CAST(FLOOR(LN(p_retailprice) * 1000 + 0.5) AS BIGINT)    AS price_ln_m,
           CAST(FLOOR(LOG10(p_retailprice) * 1000 + 0.5) AS BIGINT) AS price_log10_m,
           MOD(p_partkey, 7)                                        AS key_mod7,
           CAST(SIGN(p_size - 25) AS BIGINT)                        AS size_sign
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "math"),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (abs/floor/ceil/pow/sqrt/ln/log10/mod/sign).

    Double outputs are floor-quantized to BIGINT (see oracle comment) so
    the cross-engine hash compares exact integers, not engine-rounded
    doubles."""
    part = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return (
        part.select(
            "p_partkey",
            F.floor(price * 10 + F.lit(0.5)).cast("bigint").alias("price_decis"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            F.floor(price / 100).cast("bigint").alias("price_bucket"),
            F.ceil(price / 100).cast("bigint").alias("price_bucket_up"),
            F.pow("p_size", F.lit(2)).cast("bigint").alias("size_sq"),
            F.floor(F.sqrt("p_retailprice") * 100).cast("bigint").alias("price_sqrt_c"),
            F.floor(F.log("p_retailprice") * 1000 + F.lit(0.5)).cast("bigint").alias("price_ln_m"),
            F.floor(F.log10("p_retailprice") * 1000 + F.lit(0.5)).cast("bigint").alias("price_log10_m"),
            (F.col("p_partkey") % 7).alias("key_mod7"),
            F.signum(F.col("p_size") - F.lit(25)).cast("bigint").alias("size_sign"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_array_suite",
    # The embedding column is float32 (list<float>): every element is cast
    # to DOUBLE on BOTH sides before arithmetic (DuckDB otherwise folds in
    # float32 — ROUND(embedding[1], 4) returns a FLOAT whose widened value
    # differs from Spark's double at the 8th digit), and every float output
    # is floor-quantized to BIGINT per the repo convention so the driver
    # hash compares exact integers.  The widened doubles are bit-identical
    # on both engines, and both folds run left-to-right, so the quantized
    # sums agree exactly.
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
             AS first_elem_e4,
           CAST(FLOOR(LIST_AGGREGATE(
                  LIST_TRANSFORM(embedding,
                                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  'sum') * 1000 + 0.5) AS BIGINT)                 AS sq_norm_m,
           CAST(FLOOR(CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE)
                      * 10000 + 0.5) AS BIGINT)                   AS max_elem_e4,
           LEN(LIST_FILTER(embedding, x -> x > 0))                AS n_positive,
           CAST(FLOOR(LIST_AGGREGATE(
                  LIST_TRANSFORM(LIST_SLICE(embedding, 1, 8),
                                 x -> CAST(x AS DOUBLE)),
                  'sum') * 10000 + 0.5) AS BIGINT)                AS head_sum_e4
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("function", "array"),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: size / index / transform /
    aggregate (fold) / filter / slice — all JVM higher-order functions.
    Outputs floor-quantized to BIGINT (see oracle comment: the source
    column is float32, so unquantized engine-native rounding diverges)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def q(col, scale):
        return F.floor(col * scale + F.lit(0.5)).cast("bigint")

    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            q(F.element_at(vec, 1), 10000).alias("first_elem_e4"),
            q(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x),
              1000).alias("sq_norm_m"),
            q(F.array_max(vec), 10000).alias("max_elem_e4"),
            F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
            q(F.aggregate(F.slice(vec, 1, 8), F.lit(0.0),
                          lambda a, x: a + x), 10000).alias("head_sum_e4"),
        )
        .orderBy("vec_id")
    )


@register(
    "fn_map_suite",
    oracle="""
    SELECT doc_id,
           n_chars                                   AS chars_via_map,
           LENGTH(text)                              AS len_via_map,
           2                                         AS n_keys,
           CAST(n_chars >= LENGTH(text) AS BOOLEAN)  AS chars_gte_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("function", "map"),
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + element_at / map_keys / map_values.

    A map column is built from scalars, then consumed back to scalars so
    the oracle (which has no map) checks the same values."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("chars"), F.col("n_chars"),
        F.lit("len"), F.length("text").cast("long"),
    )
    with_map = docs.select("doc_id", m.alias("props_map"))
    return (
        with_map.select(
            "doc_id",
            F.element_at("props_map", "chars").alias("chars_via_map"),
            F.element_at("props_map", "len").cast("int").alias("len_via_map"),
            F.size(F.map_keys("props_map")).alias("n_keys"),
            (
                F.element_at("props_map", "chars")
                >= F.element_at("props_map", "len")
            ).alias("chars_gte_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_get,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_struct,
           (JSON_EXTRACT_STRING(props, '$.missing') IS NULL) AS missing_is_null
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction two ways: get_json_object and from_json→struct."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json(F.col("props"), schema)
    return (
        events.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_get"),
            parsed.getField("k").alias("k_struct"),
            F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_conditional_suite",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                                   AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'filled'
                              ELSE 'other' END                   AS status_word,
           GREATEST(o_totalprice, 150000.0)                      AS floor_price,
           LEAST(CAST(o_custkey AS BIGINT), 500)                 AS capped_cust,
           IF(o_orderpriority LIKE '1%', 1, 0)                   AS is_urgent
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
    tags=("function", "conditional"),
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chains, simple CASE, greatest/least, if()."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.when(F.col("o_orderstatus") == "O", "open")
            .when(F.col("o_orderstatus") == "F", "filled")
            .otherwise("other")
            .alias("status_word"),
            F.greatest("o_totalprice", F.lit(150000.0)).alias("floor_price"),
            F.least(F.col("o_custkey"), F.lit(500).cast("long")).alias("capped_cust"),
            F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).alias("is_urgent"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_array_hof_suite",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT vec_id,
           len(list_filter(e, x -> x > 2.0)) > 0    AS any_gt2,
           len(list_filter(e, x -> x <= -10.0)) = 0 AS all_gt_neg10,
           ROUND(list_sort(e, 'DESC')[1] + list_sort(e, 'DESC')[2], 4) + 0.0 AS top2_sum,
           ROUND(list_transform(range(1, len(e)+1),
                                i -> e[i] * list_reverse(e)[i])[1], 4) + 0.0 AS zip_first
    FROM v ORDER BY vec_id
    """,
    tags=("function", "array", "hof"),
)
def fn_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates and combinators: exists / forall /
    sort_array / zip_with(reverse) — the HOF surface beyond
    transform/filter/aggregate (covered in fn_array_suite).

    HOF lambdas run interpreted (outside codegen) — fine for per-row
    array logic; hot-path vector math uses the flat codegen forms in
    functions/vector.py instead.  The `+ 0.0` normalizes IEEE negative
    zero, which the engines produce on different rows after rounding."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    desc = F.sort_array(e, asc=False)
    return (
        emb.select(
            "vec_id",
            F.exists(e, lambda x: x > 2.0).alias("any_gt2"),
            F.forall(e, lambda x: x > -10.0).alias("all_gt_neg10"),
            (F.round(F.element_at(desc, 1) + F.element_at(desc, 2), 4) + 0.0)
            .alias("top2_sum"),
            (F.round(F.element_at(
                F.zip_with(e, F.reverse(e), lambda a, b: a * b), 1), 4) + 0.0)
            .alias("zip_first"),
        )
        .orderBy("vec_id")
    )


@register(
    "fn_regex_suite",
    # Spark regexp_replace is global by default; DuckDB needs the 'g'
    # flag.  Match counting is regexp_count on the Spark side and
    # len(regexp_extract_all) in DuckDB — same semantics, all integers
    # and strings, nothing float-typed.
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1)               AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1)               AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')          AS devoweled,
           len(regexp_extract_all(p_name, '[aeiou]'))           AS n_vowels,
           regexp_matches(p_name, '^(small|large)')             AS sized,
           CASE WHEN regexp_matches(p_name, 'o.*o')
                THEN 'double-o' ELSE 'plain' END                AS o_class
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "regex", "string"),
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function battery: extract (anchored groups), global
    replace, match counting, rlike predicates — all JVM codegen
    expressions, row-local at any scale."""
    part = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return (
        part.select(
            "p_partkey",
            F.regexp_extract(name, r"^([a-z]+)", 1).alias("first_word"),
            F.regexp_extract(name, r"([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace(name, r"[aeiou]", "_").alias("devoweled"),
            F.regexp_count(name, F.lit(r"[aeiou]")).alias("n_vowels"),
            name.rlike(r"^(small|large)").alias("sized"),
            F.when(name.rlike(r"o.*o"), "double-o").otherwise("plain")
             .alias("o_class"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_bitwise_suite",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255                                   AS low_byte,
           p_partkey | 4096                                  AS with_flag,
           xor(p_partkey, p_size)                            AS key_xor_size,
           CAST(p_size AS BIGINT) << 3                       AS size_x8,
           p_partkey >> 4                                    AS key_div16,
           bit_count(CAST(p_partkey AS BIGINT))              AS key_popcount,
           CAST(~p_partkey AS BIGINT)                        AS key_not
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator battery (& | ^ << >> popcount ~) — the hash/
    bucketing/flag arithmetic layer (every band key, Morton interleave,
    and bloom bucket in this repo is built from these).  Exact integer
    ops, identical on both engines by construction."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    k = F.col("p_partkey")
    return (
        part.select(
            "p_partkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.col("p_size")).alias("key_xor_size"),
            F.shiftleft(F.col("p_size").cast("long"), 3).alias("size_x8"),
            F.shiftright(k, 4).alias("key_div16"),
            F.bit_count(k.cast("long")).cast("long").alias("key_popcount"),
            F.bitwise_not(k).cast("long").alias("key_not"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_url_suite",
    # URLs are built deterministically from supplier fields on BOTH
    # sides; Spark parses with parse_url (java.net.URI semantics), the
    # oracle re-derives each component with plain string/regexp ops —
    # agreement proves the parser extracts exactly the declared grammar.
    oracle="""
    WITH u AS (
      SELECT s_suppkey,
             'https://supplier-' || CAST(s_nationkey AS VARCHAR)
               || '.example.com:8443/cat/' || CAST(s_suppkey % 10 AS VARCHAR)
               || '/item?sk=' || CAST(s_suppkey AS VARCHAR)
               || '&n=' || CAST(s_nationkey AS VARCHAR) || '#top' AS url
      FROM supplier
    )
    SELECT s_suppkey, url,
           regexp_extract(url, '^https://([^:/]+)', 1)        AS host,
           regexp_extract(url, '^https://([^/]+)', 1)         AS authority,
           regexp_extract(url, ':\\d+(/[^?#]*)', 1)           AS path,
           regexp_extract(url, '\\?([^#]*)', 1)               AS query,
           regexp_extract(url, 'sk=(\\d+)', 1)                AS sk_param,
           regexp_extract(url, '#(.*)$', 1)                   AS fragment,
           'https'                                            AS protocol
    FROM u
    ORDER BY s_suppkey
    """,
    tags=("function", "url", "string", "crawl"),
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (parse_url: host / authority / path / query / single
    query param / fragment / protocol — the Hive-compatible part set;
    PORT is not a parse_url key) — the first operation every crawl-curation
    pipeline runs (domain blocklists, per-host rate stats, dedup by
    canonical URL).  URLs are synthesized deterministically from
    supplier fields so the oracle can re-derive every component with
    regexps."""
    supp = load_table(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("https://supplier-"), F.col("s_nationkey").cast("string"),
        F.lit(".example.com:8443/cat/"),
        (F.col("s_suppkey") % 10).cast("string"),
        F.lit("/item?sk="), F.col("s_suppkey").cast("string"),
        F.lit("&n="), F.col("s_nationkey").cast("string"), F.lit("#top"))
    u = supp.select("s_suppkey", url.alias("url"))
    return (
        u.select(
            "s_suppkey", "url",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("AUTHORITY")).alias("authority"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("sk")).alias("sk_param"),
            F.parse_url("url", F.lit("REF")).alias("fragment"),
            F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        )
        .orderBy("s_suppkey")
    )
