"""Embedding similarity search (SURVEY.md §2.C "LLM ops"): brute-force
cosine top-k baseline, IVF-style partition-pruned search, hyperplane-LSH
bucketed ANN, and cosine near-dup pairs.

Cosine values are computed with the identical f64 fold on both engines
(verified bit-identical), then rounded to 6 decimals BEFORE ranking so
tie order is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_fingerprint
from ..functions.vector import as_double
from ..operators.ann import (
    N_PLANES,
    brute_force_topk,
    lsh_bucketed_topk,
    partition_pruned_topk,
)
from .base import register

# Shared DuckDB fragment: f64 cosine identical to functions/vector.cosine.
_DUCK_COS = """
    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
    NULLIF(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 0.0)
"""


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cos, rn
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_DUCK_COS}, 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_DUCK_COS}, 6) DESC, b.vec_id ASC) AS rn
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) t
    WHERE rn <= 5
    ORDER BY query_id, rn
    """,
    tags=("similarity", "ann", "llm"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors — the ANN ground truth.

    O(Q×N) with the query side broadcast: scales to any N as a single
    pass; Q is the bounded side by design."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "rn")


@register(
    "ann_partition_pruned_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cos, rn
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_DUCK_COS}, 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_DUCK_COS}, 6) DESC, b.vec_id ASC) AS rn
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
                        AND a.label = b.label
    ) t
    WHERE rn <= 5
    ORDER BY query_id, rn
    """,
    tags=("similarity", "ann", "ivf", "llm"),
)
def ann_partition_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell (label column).

    At 100 TB the cell is a partition column — Catalyst prunes every other
    partition at scan time, so cost is |cell| not |corpus|."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return partition_pruned_topk(emb, queries, k=5).orderBy("query_id", "rn")


def _lsh_code_sql(table_alias: str) -> str:
    """DuckDB twin of operators/ann.lsh_code (same planes, same bits)."""
    bits = []
    for p in range(N_PLANES):
        dot = (
            f"list_sum([{table_alias}.embedding::DOUBLE[])[k] * "
            f"((('0x'||substr(md5('plane{p}#'||k),1,15))::BIGINT % 2) * 2 - 1) "
            f"FOR k IN generate_series(1, 64)])"
        )
        bits.append(f"CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


@register(
    "ann_lsh_bucketed_topk",
    oracle=None,  # oracled structurally via pytest recall check vs brute force
    tags=("similarity", "ann", "lsh", "llm"),
)
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN: top-5 within the query's 16-bit bucket.

    Rows-only driver check, but quality is pinned IN the output: each row
    carries recall_at_k vs the exact brute-force top-5 for its query, so
    the recorded rows certify recall, not just shape (tests/test_llm.py
    additionally asserts determinism and the recall floor)."""
    from ..operators.ann import attach_recall_at_k, brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    approx = lsh_bucketed_topk(emb, queries.select("vec_id"), k=5)
    truth = brute_force_topk(emb, queries, k=5)
    return attach_recall_at_k(approx, truth, k=5).orderBy("query_id", "rn")


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a, b.label AS label_b,
           ROUND({_DUCK_COS}, 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_DUCK_COS} >= 0.4
    ORDER BY id_a, id_b
    """,
    tags=("similarity", "dedup", "llm"),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates: all pairs with cos ≥ 0.4.

    All-pairs is exact and fine at fixture scale; the 100 TB path is the
    LSH-bucketed variant above (same verify step, pruned candidates)."""
    from ..functions.vector import cosine_prenormed, norm_fixed
    from ..operators.minhash import fan_out_small_input

    emb = load_table(spark, sf_dir, "embeddings")
    # The O(n²) pairing runs as a broadcast nested loop: the probe side
    # must be repartitioned or a single-file input serializes every pair
    # comparison onto one core.
    a = fan_out_small_input(emb).select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"),
        as_double(F.col("embedding")).alias("va"),
    ).withColumn("na", norm_fixed("va"))
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"),
        as_double(F.col("embedding")).alias("vb"),
    ).withColumn("nb", norm_fixed("vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_prenormed("va", "vb", "na", "nb"))
        .filter(F.col("cos") >= 0.4)
        .select("id_a", "id_b", "label_a", "label_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


@register(
    "ann_ivf_kmeans_topk",
    oracle=None,  # learned-quantizer path; recall pinned by pytest vs brute force
    tags=("similarity", "ann", "ivf", "kmeans", "iterative", "llm"),
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer: distributed k-means (5
    Lloyd iterations, deterministic init) builds 16 cells; each query
    probes its 4 nearest cells and exact-cosine ranks within them
    (operators/ivf.py).  Rows-only driver check, but each row carries
    recall_at_k vs the exact brute-force top-5 for its query, so the
    recorded rows certify recall, not just shape (tests/test_llm.py
    additionally asserts the recall floor)."""
    from ..operators.ann import attach_recall_at_k, brute_force_topk
    from ..operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    approx = ivf_topk(emb, queries, k=5, n_clusters=16, nprobe=4,
                      cache_key=table_fingerprint(sf_dir, "embeddings"))
    truth = brute_force_topk(emb, queries, k=5)
    return attach_recall_at_k(approx, truth, k=5).orderBy("query_id", "rn")


@register(
    "ann_ivfpq_topk",
    oracle=None,  # learned-quantizer+codebook path; recall pinned in output
    tags=("similarity", "ann", "ivf", "pq", "adc", "kmeans", "iterative",
          "llm"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/ivfpq.py): learned 16-cell coarse quantizer
    prunes the scan to 4 probed cells per query, PQ codes (8 subspaces x
    32 entries) make the in-cell ADC scan table-lookup cheap, exact
    re-rank orders the final top-5 — the FAISS IVFPQ serving shape, both
    prunings composed.  Rows-only driver check; each row carries
    recall_at_k vs the exact brute-force top-5 so the recorded rows
    certify recall, not just shape (tests/test_llm.py asserts the
    floor)."""
    from ..operators.ann import attach_recall_at_k, brute_force_topk
    from ..operators.ivfpq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    approx = ivfpq_topk(emb, queries, k=5, n_clusters=16, nprobe=4,
                        m=8, n_codes=32,
                        cache_key=table_fingerprint(sf_dir, "embeddings"))
    truth = brute_force_topk(emb, queries, k=5)
    return attach_recall_at_k(approx, truth, k=5).orderBy("query_id", "rn")


@register(
    "embedding_centroid_drift",
    # Per-dim centroids are exact-enough AVGs; each vector's squared
    # distance is quantized at 1e-4 before the per-label max/mean so the
    # cross-engine summation jitter (~1e-15 relative) sits far below the
    # quantum.
    oracle="""
    WITH dims AS (
      SELECT vec_id, label, g.i AS pos, embedding[g.i + 1] AS x
      FROM embeddings,
           UNNEST(generate_series(0, len(embedding) - 1)) AS g(i)
    ), cent AS (
      SELECT label, pos, AVG(x) AS c FROM dims GROUP BY label, pos
    ), dist AS (
      SELECT d.vec_id, d.label,
             CAST(FLOOR(SUM((d.x - c.c) * (d.x - c.c)) * 10000 + 0.5)
                  AS BIGINT) AS sqdist_e4
      FROM dims d JOIN cent c ON d.label = c.label AND d.pos = c.pos
      GROUP BY d.vec_id, d.label
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(sqdist_e4) // COUNT(*) AS BIGINT) AS mean_sqdist_e4,
           MAX(sqdist_e4) AS max_sqdist_e4
    FROM dist
    GROUP BY label
    ORDER BY label
    """,
    tags=("embedding", "monitoring", "centroid", "quality", "llm"),
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table integrity monitor: per-label centroids and each
    vector's squared distance to its centroid, reported as per-label
    mean/max — the drift signal that catches an embedding-model change,
    bad ingestion batch, or label corruption before it poisons
    similarity search.

    Two aggregates over one exploded (vec, dim) frame: the D x labels
    centroid table (broadcast back) and the per-vector distance rollup.
    At 100 TB centroids are a stored artifact and the scan is one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
         .alias("pos", "x"))
    cent = dims.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    dist = (
        dims.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.floor(
            F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            * 10000 + F.lit(0.5)).cast("bigint").alias("sqdist_e4"))
    )
    return (
        dist.groupBy("label")
        .agg(F.count("*").alias("n_vecs"),
             F.expr("sum(sqdist_e4) div count(*)").alias("mean_sqdist_e4"),
             F.max("sqdist_e4").alias("max_sqdist_e4"))
        .orderBy("label")
    )


@register(
    "decontam_embedding_overlap",
    # Benchmark split = vec_id % 10 == 0 (held-out eval analogue); a
    # corpus vector is CONTAMINATED if its cosine against ANY benchmark
    # vector reaches 0.35.  The oracle recomputes the exact max-cosine
    # per corpus vector; per-label counts + flagged totals hash-certify
    # the decision boundary, not just the counts.
    oracle=f"""
    WITH bench AS (
      SELECT * FROM embeddings WHERE vec_id % 10 = 0
    ), corpus AS (
      SELECT * FROM embeddings WHERE vec_id % 10 <> 0
    ), scored AS (
      SELECT a.vec_id, a.label,
             MAX({_DUCK_COS}) AS max_cos
      FROM corpus a CROSS JOIN bench b
      GROUP BY a.vec_id, a.label
    )
    SELECT label,
           COUNT(*)                                        AS n_vectors,
           CAST(SUM(CASE WHEN max_cos >= 0.35 THEN 1 ELSE 0 END)
                AS BIGINT)                                 AS n_contaminated,
           CAST(FLOOR(MAX(max_cos) * 1e6 + 0.5) AS BIGINT) AS max_cos_micro
    FROM scored
    GROUP BY label
    ORDER BY label
    """,
    tags=("similarity", "decontamination", "curation", "llm"),
)
def decontam_embedding_overlap(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Embedding-based benchmark decontamination — the SEMANTIC
    complement of the n-gram `decontam_benchmark_overlap`: a corpus
    vector whose cosine against any held-out benchmark vector reaches
    the threshold is flagged as contaminated (paraphrased leakage that
    n-gram matching misses).  The benchmark side is broadcast — at
    100 TB the corpus streams once past the (small) benchmark matrix,
    exactly the one-pass shape of `ann_bruteforce_topk`; here the
    per-vector MAX cosine rides a groupBy instead of a top-k window.
    Flagged totals AND the max-cosine boundary are hash-certified."""
    from ..functions.vector import cosine_prenormed, norm_fixed
    from ..operators.minhash import fan_out_small_input

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("id_b"),
        as_double(F.col("embedding")).alias("vb"),
    ).withColumn("nb", norm_fixed("vb"))
    corpus = fan_out_small_input(
        emb.filter(F.col("vec_id") % 10 != 0)).select(
        "vec_id", "label",
        as_double(F.col("embedding")).alias("va"),
    ).withColumn("na", norm_fixed("va"))
    scored = (corpus.join(F.broadcast(bench))
              .withColumn("cos", cosine_prenormed("va", "vb", "na", "nb"))
              .groupBy("vec_id", "label")
              .agg(F.max("cos").alias("max_cos")))
    return (scored.groupBy("label")
            .agg(F.count("*").alias("n_vectors"),
                 F.sum(F.when(F.col("max_cos") >= 0.35, 1).otherwise(0))
                 .alias("n_contaminated"),
                 F.floor(F.max("max_cos") * 1e6 + F.lit(0.5)).cast("bigint")
                 .alias("max_cos_micro"))
            .orderBy("label"))
