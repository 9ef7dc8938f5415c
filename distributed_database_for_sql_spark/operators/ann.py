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


def _seq_dot(a, b):
    """Row-vectorized dot with STRICT left-to-right accumulation over the
    dimension axis: acc = ((a₁b₁ + a₂b₂) + a₃b₃) + … — the same IEEE-754
    operation order as the flat JVM expression (`_dot_sql`) and DuckDB's
    sequential list fold, so every cosine is bit-identical across all
    three engines.  A numpy `dot`/`einsum` would use pairwise/SIMD
    accumulation and break that equivalence."""
    import numpy as np

    acc = a[:, 0:1] * b[0:1, :]
    for d in range(1, a.shape[1]):
        acc = acc + a[:, d:d + 1] * b[d:d + 1, :]
    return acc  # (rows(a) × cols(b)) float64


def _seq_norm(a):
    """‖row‖ per row with the same left-to-right accumulation as
    `norm_fixed`'s flat JVM sum — O(n·dim), no n×n intermediate."""
    import numpy as np

    acc = a[:, 0] * a[:, 0]
    for d in range(1, a.shape[1]):
        acc = acc + a[:, d] * a[:, d]
    return np.sqrt(acc)


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Exact top-k by cosine, computed as ONE scan with partition-local
    top-k reduction — the scalable exact-kNN shape:

    - The query set (bounded by design) is collected to a Q×dim float64
      matrix and closed over by an Arrow-batched ``mapInPandas`` stage.
    - Each candidate batch scores all Q queries vectorized (bit-exact
      left-to-right accumulation — see `_seq_dot`) and emits only its
      LOCAL top-k per query, plus a ±2e-6 guard band so candidates whose
      fast float rounding could disagree with Spark's decimal HALF_UP
      rounding are never cut (the final exact ranking decides them).
    - The global window then ranks ≤ partitions × Q × (k+ε) rows instead
      of Q × N pairs: shuffle volume is independent of corpus size, which
      is what survives a 100×-bigger N.  (The previous all-pairs form
      also evaluated the 64-term cosine expression interpreted — too wide
      for whole-stage codegen — at ~0.4 µs/term; numpy is ~100× that.)

    Guard-band proof: if a batch drops X, ≥ k batch-mates have fast-round
    ≥ X's + 2e-6; exact HALF_UP rounding differs from fast rounding by at
    most one 1e-6 grid step, so those mates strictly beat X on the exact
    rounded cosine too — X was never in the global top-k."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()  # bounded: Q queries
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rn int")
    qids = np.array([r[0] for r in qrows], dtype="int64")
    qm = np.array([r[1] for r in qrows], dtype="float64")  # Q × dim, exact
    qn = _seq_norm(qm)  # left-to-right accumulation, as the JVM flat sum

    # scan parallelism = input partitions (at scale the corpus is many
    # files; a deliberate repartition here measured SLOWER at fixture
    # size — the numpy scan outruns the exchange it would add)
    local = emb.select(id_col, vec_col).mapInPandas(
        _local_topk_scan(qids, qm, qn, k, id_col, vec_col),
        "query_id long, neighbor_id long, cos double")
    return _ranked_topk(local, k)


def _local_topk_scan(qids, qm, qn, k, id_col, vec_col, qualifier=None):
    """mapInPandas generator: score each candidate batch against every
    query (bit-exact left-to-right f64 — `_seq_dot`) and emit the batch-
    local top-k per query plus the ±2e-6 rounding guard band.

    `qualifier(cids, cm) -> (n × Q) bool` optionally restricts which
    candidates a query may see (e.g. LSH band agreement); non-qualifying
    pairs never score.  Self-pairs and zero-norm candidates are always
    excluded."""
    import numpy as np
    import pandas as pd

    def score_batches(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            cids = pdf[id_col].to_numpy(dtype="int64")
            cm = np.array(list(pdf[vec_col]), dtype="float64")  # n × dim
            cn = _seq_norm(cm)
            denom = cn[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = _seq_dot(cm, qm.T) / denom          # n × Q
            cos[denom == 0] = -np.inf                      # NULL-cos: never top-k
            cos[cids[:, None] == qids[None, :]] = -np.inf  # self-pairs
            if qualifier is not None:
                cos[~qualifier(cids, cm)] = -np.inf
            # fast HALF-AWAY-FROM-ZERO rounding for SELECTION only; the
            # exact Spark round() decides final order downstream
            rf = np.where(cos >= 0, np.floor(cos * 1e6 + 0.5),
                          np.ceil(cos * 1e6 - 0.5)) / 1e6
            parts = []
            for qi in range(len(qids)):
                col = rf[:, qi]
                finite = np.isfinite(col)
                nf = int(finite.sum())
                if nf == 0:
                    continue
                if nf > k:
                    kth = np.partition(col[finite], nf - k)[nf - k]
                    sel = finite & (col >= kth - 2e-6)
                else:
                    sel = finite
                idx = np.nonzero(sel)[0]
                parts.append(pd.DataFrame({
                    "query_id": np.full(len(idx), qids[qi]),
                    "neighbor_id": cids[idx],
                    "cos": cos[idx, qi],
                }))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return score_batches


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

    At scale: the whole thing is ONE candidate scan — the query codes
    (bounded Q) ride along in the mapInPandas closure, each batch computes
    its candidates' codes with one numpy matmul, band agreement is an
    integer comparison, and only batch-local top-k survivors (not the
    Q × candidates pair space) reach the final ranking shuffle.  On a
    stored corpus the code column would be precomputed at ingest; the
    sign test and cosine math are identical either way."""
    import numpy as np

    bits = N_PLANES // bands
    S = sign_matrix(dim)                       # (P, D) ±1, md5-derived
    weights = (1 << np.arange(N_PLANES)).astype("int64")
    band_shift = (np.arange(bands) * bits).astype("int64")
    band_mask = (1 << bits) - 1

    def codes_of(m):
        return (((m @ S.T) > 0) @ weights).astype("int64")  # (n,)

    def band_keys(codes):
        return (codes[:, None] >> band_shift[None, :]) & band_mask  # n×bands

    qrows = (emb.join(queries.select(id_col), id_col, "left_semi")
             .select(id_col, vec_col).collect())
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rn int")
    qids = np.array([r[0] for r in qrows], dtype="int64")
    qm = np.array([r[1] for r in qrows], dtype="float64")
    qn = _seq_norm(qm)
    qkeys = band_keys(codes_of(qm))            # Q × bands

    def qualifier(cids, cm):
        ckeys = band_keys(codes_of(cm))        # n × bands
        # candidate qualifies for a query if ANY band sub-key matches
        return (ckeys[:, None, :] == qkeys[None, :, :]).any(axis=2)

    local = emb.select(id_col, vec_col).mapInPandas(
        _local_topk_scan(qids, qm, qn, k, id_col, vec_col, qualifier),
        "query_id long, neighbor_id long, cos double")
    return _ranked_topk(local, k)


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
