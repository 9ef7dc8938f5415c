"""IVF-PQ ANN: coarse cell pruning composed with PQ-ADC scanning.

The FAISS IVFPQ shape (Jégou et al. 2011), built from the two operators
this engine already has:

1. A coarse k-means quantizer (operators/ivf.py) partitions the corpus
   into cells; every vector stores its cell id next to its PQ codes.
2. PQ codebooks (operators/pq.py) compress each vector to m small codes.
3. Search: each query probes its nprobe nearest cells, and the ADC
   lookup-table scan runs ONLY inside those cells — the equi join on the
   cell id replaces pure PQ's full-corpus scan, cutting scanned rows to
   ~nprobe/n_clusters of the corpus while the codes cut bytes-per-row.
   At 100 TB this is the standard layout: parquet partitioned by cell,
   codes in-file, so a probe reads only its cells' files (partition
   pruning) and only the code column (column pruning).
4. Exact re-rank of rerank_factor*k ADC candidates, same output contract
   as brute_force_topk (query_id, neighbor_id, cos, rn).

Pure PQ (operators/pq.py) keeps being the right call when recall must
not depend on cell boundaries; IVF alone (operators/ivf.py) when
vectors are cheap to scan but the corpus is huge.  This composition is
the serving configuration for both-large cases.

The reference (a Go Raft core, SURVEY.md §2.A) has no vector surface;
this extends §2.C's LLM-ops inventory on the public-paper recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine_prenormed, norm_fixed
from .ivf import _probe_udf, kmeans_fit
from .pq import _adc_score_udf, _query_luts_udf, pq_encode_udf, pq_fit


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 32,
    kmeans_iters: int = 5,
    pq_iters: int = 4,
    dim: int = 64,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors via cell-pruned ADC scan + exact re-rank.

    The corpus is encoded once (cell id + m codes per vector); the scan
    is an equi join probe-cells x corpus-cells with the per-query 1 KB
    LUTs broadcast — cost ~ (nprobe/n_clusters) * N * Q table lookups.
    Queries stay distributed; only LUTs and the tiny candidate list are
    broadcast."""
    centroids, assign = kmeans_fit(emb, id_col, vec_col, k=n_clusters,
                                   iters=kmeans_iters, dim=dim,
                                   cache_key=cache_key)
    codebooks = pq_fit(emb, id_col, vec_col, m=m, k=n_codes,
                       iters=pq_iters, dim=dim, cache_key=cache_key)

    coded = emb.select(
        F.col(id_col).alias("neighbor_id"),
        assign(as_double(F.col(vec_col))).alias("cell"),
        pq_encode_udf(codebooks)(as_double(F.col(vec_col))).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", norm_fixed("qv", dim)).withColumn(
        "lut", _query_luts_udf(codebooks)(F.col("qv")))
    probe = q.select(
        "query_id", "qn", "lut",
        F.explode(_probe_udf(centroids, nprobe)(F.col("qv"))).alias("cell"),
    )

    adc = _adc_score_udf(m, n_codes)
    scored = (
        coded.join(F.broadcast(probe), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc("codes", "lut", "qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id"))
    cands = (
        scored.withColumn("arn", F.row_number().over(w))
        .filter(F.col("arn") <= rerank_factor * k)
        .select("query_id", "neighbor_id")
    )

    cand_vecs = emb.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).join(F.broadcast(cands.select("neighbor_id").distinct()),
           "neighbor_id", "left_semi").withColumn("cn", norm_fixed("cv", dim))
    pairs = (
        cand_vecs.join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .withColumn("cos", cosine_prenormed("qv", "cv", "qn", "cn", dim))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_r"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cos_r", F.round("cos", 6))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos_r").alias("cos"), "rn")
    )
