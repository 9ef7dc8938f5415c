"""Approximate nearest-neighbor search over embedding columns.

Three strategies, in increasing scale-readiness (SURVEY.md §2.C "LLM ops"):

1. `brute_force_topk` — exact: normalize once, broadcast the (small) query
   set, cosine against every candidate, per-query top-k window.  O(Q×N);
   the baseline and the verifier for the approximate paths.
2. `partition_pruned_topk` — IVF-style: restrict each query's search to
   its coarse cell (here the `label` column stands in for a learned
   quantizer cell).  At 100 TB cells map to parquet partitions → partition
   pruning skips the data entirely.
3. `lsh_bucketed_topk` — random-hyperplane LSH: 16 deterministic sign
   planes (portable md5-derived) split into 4 bands of 4 bits; candidates
   share ANY band with the query (OR-amplification — a single 16-bit
   bucket is so selective that most queries find zero mates).
   Deterministic planes make even this approximate path reproducible.

All cosine math is f64 fold-based (functions/vector.py) — bit-identical
across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import hashlib

from ..functions.text import md5_long
from ..functions.vector import (
    as_double,
    cosine_prenormed,
    norm_fixed,
)

N_PLANES = 16


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Rank candidates per query on rounded cosine (engine-stable), top-k."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_r"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("cos_r", F.round("cos", 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos_r").alias("cos"), "rn")
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Exact top-k by cosine; query set broadcast, one pass over candidates."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm_fixed("qv", dim))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm_fixed("cv", dim))
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_prenormed("qv", "cv", "qn", "cn", dim))
    )
    return _ranked_topk(pairs, k)


def partition_pruned_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", cell_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """IVF-style: each query only scans its own coarse cell."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("qcell"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", norm_fixed("qv", dim))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("ccell"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", norm_fixed("cv", dim))
    pairs = (
        c.join(
            F.broadcast(q),
            (F.col("qcell") == F.col("ccell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cos", cosine_prenormed("qv", "cv", "qn", "cn", dim))
    )
    return _ranked_topk(pairs, k)


def plane_sign(p: int, k: F.Column) -> F.Column:
    """Deterministic ±1 for plane p, dimension k (portable md5 parity)."""
    return (
        md5_long(F.concat(F.lit(f"plane{p}#"), k.cast("string"))) % 2
    ) * 2 - 1


def plane_sign_py(p: int, k: int) -> int:
    """Python twin of plane_sign — same md5, same parity, same ±1."""
    return int(hashlib.md5(f"plane{p}#{k}".encode()).hexdigest()[:15], 16) % 2 * 2 - 1


def sign_matrix(dim: int = 64, n_planes: int = N_PLANES):
    """(n_planes × dim) ±1 matrix, md5-derived — identical to plane_sign."""
    import numpy as np

    return np.array(
        [[plane_sign_py(p, k) for k in range(1, dim + 1)]
         for p in range(n_planes)],
        dtype="float64",
    )


def lsh_code(vec: F.Column, dim: int = 64, n_planes: int = N_PLANES) -> F.Column:
    """16-bit random-hyperplane code: bit p = sign(Σ_k vec[k]·s(p,k)) > 0.

    Column-expression form (kept for SQL-portability tests): one flat
    dim-term projection per plane.  For the hot path use
    `lsh_code_pandas` — an n_planes×dim expression tree is a Janino
    compile bomb (seconds of fixed cost per plan), while the Pandas UDF
    is one numpy matmul per Arrow batch.
    """
    code = F.lit(0).cast("long")
    for p in range(n_planes):
        signs = [plane_sign_py(p, k) for k in range(1, dim + 1)]
        dot_p = F.element_at(vec, 1).cast("double") * signs[0]
        for k in range(2, dim + 1):
            dot_p = dot_p + F.element_at(vec, k).cast("double") * signs[k - 1]
        code = code + F.when(dot_p > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return code


def lsh_code_pandas(dim: int = 64, n_planes: int = N_PLANES):
    """Vectorized lsh_code: Arrow-batched pandas_udf, V @ Sᵀ > 0 → bits.

    Bit-identical to lsh_code (same md5-derived planes, f64 dot products
    of exactly-representable ±1 coefficients agree in any summation
    order close enough for a *sign* test on non-degenerate data)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    S = sign_matrix(dim, n_planes)  # (P, D)
    weights = (1 << np.arange(n_planes)).astype("int64")

    def code(vecs):
        V = np.vstack(vecs.to_numpy()).astype("float64")  # (N, D)
        bits = (V @ S.T) > 0                              # (N, P)
        return pd.Series(bits @ weights)

    # Real class objects, not strings: `from __future__ import annotations`
    # would otherwise leave hints pandas_udf's inference can't resolve.
    code.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(code, "long")


def lsh_bucketed_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
    bands: int = 4,
) -> DataFrame:
    """ANN: banded hyperplane LSH (OR-amplification over `bands` sub-codes).

    A single 16-bit bucket is too selective on high-entropy embeddings —
    ~|corpus|/65536 expected bucket mates means most queries find NOTHING.
    Instead the 16-plane code splits into `bands` sub-keys (4 bits each);
    a candidate qualifies if it shares ANY band with the query.  P(cand)
    rises steeply with cosine (per-plane agreement ≈ 1 − θ/π), which is
    the classic recall/cost dial: more bands → higher recall, more
    candidates to verify.

    At scale: codes are precomputed columns, the band join is an equi
    shuffle on (band, key) with queries broadcast, and the exact-cosine
    verify runs only on the pruned candidate set."""
    bits = N_PLANES // bands
    with_code = emb.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        lsh_code_pandas(dim)(as_double(F.col(vec_col))).alias("code"),
    ).withColumn("n", norm_fixed("v", dim))
    banded = with_code.select(
        id_col, "v", "n", "code",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_key",
        F.expr(f"(code div (1 << (band * {bits}))) % {1 << bits}"),
    ).drop("code")
    q = banded.join(queries.select(id_col), id_col, "left_semi").select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"), "band", "band_key",
    )
    c = banded.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("n").alias("cn"), "band", "band_key",
    )
    pairs = (
        c.join(F.broadcast(q), ["band", "band_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv", "qn", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", cosine_prenormed("qv", "cv", "qn", "cn", dim))
    )
    return _ranked_topk(pairs, k)


def attach_recall_at_k(approx: DataFrame, truth: DataFrame,
                       k: int) -> DataFrame:
    """Add a per-query `recall_at_k` column to an approximate top-k result.

    `truth` is the exact top-k for the same queries (brute_force_topk);
    recall@k = |approx ∩ truth| / k per query_id, repeated on each of the
    query's rows.  Makes the quality of a no-oracle ANN result visible in
    the result itself (a rows-only correctness check then still pins
    recall, not just shape).  The truth side is queries×k rows — broadcast.
    """
    t = (truth.select("query_id", "neighbor_id")
         .withColumn("__hit", F.lit(1)))
    w = Window.partitionBy("query_id")
    return (
        approx.join(F.broadcast(t), ["query_id", "neighbor_id"], "left")
        .withColumn(
            "recall_at_k",
            F.round(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).over(w)
                    / F.lit(k), 4))
        .drop("__hit")
    )
