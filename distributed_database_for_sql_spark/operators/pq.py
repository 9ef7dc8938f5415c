"""Product quantization (PQ) ANN: subspace k-means codebooks + ADC search.

The PQ recipe (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the same coding FAISS's IndexPQ uses):

1. Split each dim-D vector into `m` subvectors of D/m dims; learn an
   independent k-entry codebook per subspace.  Training runs as ONE
   distributed Lloyd's loop over the (sub, subvec) exploded frame — all m
   codebooks per iteration in a single assignment pass (Arrow-batched
   numpy argmin) and a single (sub, cell, pos) mean shuffle.  Driver
   state is only the m×k×(D/m) codebook tensor = the index metadata.
2. Encode: every vector compresses to m small codes (default m=8, k=32
   → 5 bytes/vector vs 256 bytes of f32: ~50× less scan IO at 100 TB;
   the codes column rides in the same parquet).  Synthetic near-random
   embeddings are the worst case for vector quantization, hence the
   larger-than-minimal codebooks + generous exact re-rank; both dials
   shrink for real (clustered) embedding distributions.
3. Search (ADC — asymmetric distance computation): each QUERY builds a
   lookup table of its dot product / norm contribution against every
   codebook entry (m·k doubles ≈ 1 KB); every corpus row is then scored
   with m table lookups — no per-pair vector math.  The scored stream is
   a linear scan that composes with IVF cell pruning (operators/ivf.py)
   at scale.
4. Exact re-rank: ADC selects rerank_factor·k candidates; the true
   cosine orders the final top-k (FAISS's standard refine step), which
   also makes the output schema identical to brute_force_topk.

The reference (a Go Raft core) has no vector surface; this extends
SURVEY.md §2.C's LLM-ops inventory on the public-paper recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine_prenormed, norm_fixed


def _normalize_udf():
    """pandas_udf: vector → vector/‖vector‖ (f64).

    Cosine ranking is invariant to corpus-side scaling, so codebooks are
    learned and codes assigned on UNIT vectors — norm variance would
    otherwise spend codebook entropy on magnitude instead of direction
    (the standard cosine-PQ preprocessing)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def normalize(vecs: "pd.Series") -> "pd.Series":
        V = np.vstack(vecs.to_numpy()).astype("float64")
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(list(V / n))

    normalize.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(normalize, "array<double>")


def _subvec_rows(emb: DataFrame, id_col: str, vec_col: str,
                 m: int, ds: int) -> DataFrame:
    """(id, sub, subvec) rows: each unit vector exploded into m slices."""
    unit = emb.select(
        F.col(id_col).alias("id"),
        _normalize_udf()(as_double(F.col(vec_col))).alias("u"),
    )
    slices = F.array(*[F.slice("u", s * ds + 1, ds) for s in range(m)])
    return unit.select("id", F.posexplode(slices).alias("sub", "subvec"))


def _assign_subspace_udf(codebooks):
    """pandas_udf: (sub, subvec) → nearest codebook entry in that subspace.

    One numpy pass per (Arrow batch × subspace): rows are masked by their
    subspace id, then argmin ‖v−c‖² against that subspace's codebook."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks, dtype="float64")          # (m, k, ds)
    c2 = (C * C).sum(axis=2)                            # (m, k)

    def assign(sub: "pd.Series", vecs: "pd.Series") -> "pd.Series":
        s_arr = sub.to_numpy()
        V = np.vstack(vecs.to_numpy()).astype("float64")
        out = np.zeros(len(V), dtype="int32")
        for s in np.unique(s_arr):
            mask = s_arr == s
            d = c2[s][None, :] - 2.0 * (V[mask] @ C[s].T)
            out[mask] = d.argmin(axis=1)
        return pd.Series(out)

    assign.__annotations__ = {"sub": pd.Series, "vecs": pd.Series,
                              "return": pd.Series}
    return pandas_udf(assign, "int")


# Same memoization contract as ivf._KMEANS_CACHE: ann_pq_adc_topk and
# ann_ivfpq_topk train identical codebooks on the same corpus.
_PQ_CACHE: dict[tuple, "object"] = {}


def pq_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 4,
    dim: int = 64,
    cache_key: str | None = None,
):
    """Learn m subspace codebooks (k entries each) with one distributed
    Lloyd's loop; returns the (m, k, D/m) codebook tensor (numpy).

    Deterministic init: the k lowest-id vectors, sliced per subspace.
    Per iteration: one assignment pass (Arrow batches) + one
    (sub, cell, pos) mean aggregation — m·k·(D/m) = D·k partial-mean rows
    shuffle, never vectors to the driver."""
    import numpy as np

    if cache_key is not None:
        ck = (cache_key, id_col, vec_col, m, k, iters, dim)
        if ck in _PQ_CACHE:
            return _PQ_CACHE[ck]
    ds = dim // m
    seed_rows = (
        emb.orderBy(id_col).limit(k)
        .select(as_double(F.col(vec_col)).alias("v")).collect()
    )
    seeds = np.asarray([list(r.v) for r in seed_rows], dtype="float64")
    norms = np.linalg.norm(seeds, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    seeds = seeds / norms  # codebooks live in unit-vector space
    codebooks = np.stack([seeds[:, s * ds:(s + 1) * ds] for s in range(m)])

    sub_rows = _subvec_rows(emb, id_col, vec_col, m, ds).persist()
    sub_rows.count()
    for _ in range(iters):
        assigned = sub_rows.select(
            "sub", "subvec",
            _assign_subspace_udf(codebooks)("sub", "subvec").alias("cell"),
        )
        stats = (
            assigned.select("sub", "cell", F.posexplode("subvec")
                            .alias("pos", "x"))
            .groupBy("sub", "cell", "pos")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        new = codebooks.copy()  # empty cells keep their old entry
        for r in stats:
            new[r.sub, r.cell, r.pos] = r.mu
        codebooks = new
    sub_rows.unpersist()
    if cache_key is not None:
        _PQ_CACHE[(cache_key, id_col, vec_col, m, k, iters, dim)] = codebooks
    return codebooks


def pq_encode_udf(codebooks):
    """pandas_udf: full vector → its m PQ codes (array<int>).

    Vectorized over the Arrow batch: reshape (N, m, ds), batched einsum
    against each codebook, per-subspace argmin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks, dtype="float64")          # (m, k, ds)
    c2 = (C * C).sum(axis=2)                            # (m, k)
    m, _, ds = C.shape

    def encode(vecs: "pd.Series") -> "pd.Series":
        V = np.vstack(vecs.to_numpy()).astype("float64")
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        V = (V / n).reshape(-1, m, ds)  # codes index unit-vector codebooks
        # dots[n, s, c] = V[n, s] · C[s, c]
        dots = np.einsum("nsd,scd->nsc", V, C)
        codes = (c2[None, :, :] - 2.0 * dots).argmin(axis=2).astype("int32")
        return pd.Series(list(codes))

    encode.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(encode, "array<int>")


def _query_luts_udf(codebooks):
    """pandas_udf: query vector → flattened [dot-LUT ‖ norm²-LUT].

    lut_dot[s·k+c] = q_s·C[s,c]; lut_n2[s·k+c] = ‖C[s,c]‖².  Approximate
    cosine of a corpus row with codes (c_1..c_m) is then
    Σ_s lut_dot[s·k+c_s] / (‖q‖·sqrt(Σ_s lut_n2[s·k+c_s]))."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks, dtype="float64")
    c2 = (C * C).sum(axis=2)                            # (m, k)
    m, k, ds = C.shape

    def luts(vecs: "pd.Series") -> "pd.Series":
        V = np.vstack(vecs.to_numpy()).astype("float64").reshape(-1, m, ds)
        dots = np.einsum("nsd,scd->nsc", V, C).reshape(len(V), m * k)
        n2 = np.broadcast_to(c2.reshape(1, m * k), dots.shape)
        return pd.Series(list(np.concatenate([dots, n2], axis=1)))

    luts.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(luts, "array<double>")


def _adc_score_udf(m: int, k: int):
    """pandas_udf: (codes, lut) → approximate cosine numerator/denominator
    via m table lookups per row — the ADC inner loop, vectorized with one
    numpy take per batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    offs = (np.arange(m) * k).astype("int64")

    def score(codes: "pd.Series", lut: "pd.Series", qn: "pd.Series") -> "pd.Series":
        Cd = np.vstack(codes.to_numpy()).astype("int64") + offs[None, :]
        L = np.vstack(lut.to_numpy())                   # (N, 2·m·k)
        dot = np.take_along_axis(L[:, :m * k], Cd, axis=1).sum(axis=1)
        n2 = np.take_along_axis(L[:, m * k:], Cd, axis=1).sum(axis=1)
        denom = qn.to_numpy() * np.sqrt(n2)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, dot / denom, 0.0)
        return pd.Series(out)

    score.__annotations__ = {"codes": pd.Series, "lut": pd.Series,
                             "qn": pd.Series, "return": pd.Series}
    return pandas_udf(score, "double")


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 32,
    iters: int = 4,
    dim: int = 64,
    rerank_factor: int = 10,
    max_broadcast_queries: int = 100_000,
    cache_key: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors via PQ-ADC scan + exact re-rank.

    The corpus is touched twice: once as the 4-byte/vector code scan
    (ADC scoring, selects rerank_factor·k per query), once as a
    candidate-pruned exact-cosine re-rank (broadcast semi-join on the
    tiny candidate set).  Queries stay distributed; their 1 KB LUTs are
    broadcast into the code scan.

    Broadcast boundary: the scan couples every code row to the broadcast
    query set, which is right for serving-sized Q (LUTs are ~1 KB each).
    Above `max_broadcast_queries` the queries are hash-split into
    ceil(Q / max) chunks, each chunk broadcast-scanned separately and the
    scans unioned — compute stays the exhaustive O(N·Q) (that is what an
    exhaustive ADC scan is; a corpus-sized Q wants the IVF cell-blocked
    form, operators/ivf.py), but no single broadcast exceeds the bound.
    The re-rank's candidate broadcast grows as rerank_factor·k·Q rows of
    two longs and stays far smaller than the LUT side."""
    codebooks = pq_fit(emb, id_col, vec_col, m=m, k=n_codes, iters=iters,
                       dim=dim, cache_key=cache_key)
    coded = emb.select(
        F.col(id_col).alias("neighbor_id"),
        pq_encode_udf(codebooks)(as_double(F.col(vec_col))).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", norm_fixed("qv", dim)).withColumn(
        "lut", _query_luts_udf(codebooks)(F.col("qv")))

    qsel = q.select("query_id", "qn", "lut")
    n_q = queries.count()
    scan_cond = F.col("query_id") != F.col("neighbor_id")
    adc = _adc_score_udf(m, n_codes)
    if n_q <= max_broadcast_queries:
        scored = (coded.join(F.broadcast(qsel), scan_cond)
                  .withColumn("adc", adc("codes", "lut", "qn")))
    else:
        from functools import reduce

        n_chunks = -(-n_q // max_broadcast_queries)
        parts = [
            coded.join(
                F.broadcast(qsel.filter(
                    F.pmod(F.xxhash64("query_id"), F.lit(n_chunks)) == i)),
                scan_cond,
            ).withColumn("adc", adc("codes", "lut", "qn"))
            for i in range(n_chunks)
        ]
        scored = reduce(DataFrame.unionByName, parts)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id"))
    cands = (
        scored.withColumn("arn", F.row_number().over(w))
        .filter(F.col("arn") <= rerank_factor * k)
        .select("query_id", "neighbor_id")
    )

    # Exact re-rank on the pruned candidates (same output contract as
    # brute_force_topk: query_id, neighbor_id, cos, rn).
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
