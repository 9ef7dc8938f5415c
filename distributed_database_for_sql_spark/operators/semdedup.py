"""Semantic deduplication (SemDeDup-style): embedding k-means cells +
within-cell cosine pruning.

The public recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023): cluster embeddings
with k-means, and inside each cluster drop every item that has a
sufficiently-similar neighbor, keeping one representative.  Exact/
MinHash dedup catches textual near-copies; this catches *semantic*
copies (paraphrases, translations, re-renders) that share no n-grams.

Spark shape:
- the coarse clustering reuses operators/ivf.kmeans_fit (distributed
  Lloyd's, driver holds only k centroids);
- candidate pairs are an equi self-join ON THE CELL ID — the cluster
  plays the LSH-band role, bounding the quadratic term to cell sizes
  (the 100 TB discipline: never all-pairs, always block-then-compare);
- the keep rule is deterministic: within a cell, an item is a duplicate
  iff some LOWER-id item in the same cell has cosine >= threshold with
  it (greedy low-id-survivor, one anti-join — no iteration).

The reference (a Go Raft core, SURVEY.md §2.A) has no dedup surface;
this extends §2.C's LLM-ops inventory on the public-paper recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine_prenormed, norm_fixed
from .ivf import kmeans_fit


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.85,
    n_clusters: int = 16,
    iters: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Label every vector keep/duplicate under within-cell cosine pruning.

    Returns (id_col, cell, is_dup, dup_of) — dup_of is the lowest-id
    similar neighbor for duplicates, NULL for survivors.  One cell-keyed
    self-join bounds all pair work to cell sizes."""
    _, assign = kmeans_fit(emb, id_col, vec_col, k=n_clusters,
                           iters=iters, dim=dim, cache_key=cache_key)
    base = (emb.select(F.col(id_col).alias("id"),
                       as_double(F.col(vec_col)).alias("v"))
            .withColumn("cell", assign(F.col("v")))
            .withColumn("n", norm_fixed("v", dim))
            .persist())

    a = base.select(F.col("id").alias("id_lo"), F.col("cell"),
                    F.col("v").alias("va"), F.col("n").alias("na"))
    b = base.select(F.col("id").alias("id_hi"), F.col("cell"),
                    F.col("v").alias("vb"), F.col("n").alias("nb"))
    dup_links = (
        a.join(b, "cell")
        .filter(F.col("id_lo") < F.col("id_hi"))
        .withColumn("cos", cosine_prenormed("va", "vb", "na", "nb", dim))
        .filter(F.col("cos") >= threshold)
        .groupBy(F.col("id_hi").alias("id"))
        .agg(F.min("id_lo").alias("dup_of"))
    )
    return (
        base.join(dup_links, "id", "left")
        .select(F.col("id").alias(id_col), "cell",
                F.col("dup_of").isNotNull().alias("is_dup"), "dup_of")
    )
