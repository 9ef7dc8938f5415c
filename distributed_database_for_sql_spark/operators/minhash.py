"""MinHash + LSH near-duplicate detection — a distributed pipeline operator
Spark has no primitive for (SURVEY.md §2.C / §4.2: algorithmic pruning,
not a Catalyst rule).

Pipeline (all DataFrame ops, no Python in the row path):

    shingle → explode → base-hash each shingle ONCE (codegen'd)
            → per-doc signature: num_hashes `min` aggregates over the
              linear permutations (aᵢ·h + bᵢ) mod P, map-side combined
            → split signature into bands, hash each band
            → explode bands, self-join on (band, band_key)
            → distinct candidate pairs
            → exact Jaccard verification on shingle sets (candidates
              broadcast — shingle arrays never shuffle)
            → keep pairs ≥ threshold

Scale notes (100 TB):
- Signature computation is embarrassingly parallel, one pass per doc.
- The band self-join shuffles `docs × bands` small rows; hot buckets
  (boilerplate text) are the skew risk — `max_bucket` caps them, which
  bounds the quadratic pair blow-up per bucket; AQE skew-join splits the
  rest.
- Verification re-joins the shingle arrays only for surviving candidates.
- Permutation constants are Python-precomputed (hashlib md5, identical to
  the SQL md5) so DuckDB can reproduce every intermediate value.

Recall math: P(candidate | J=s) = 1 − (1 − s^r)^b; with r=2, b=64 a pair
at J=0.5 is missed with p ≈ 1e-8 — effectively exhaustive above 0.5,
which is what lets the exact all-pairs oracle validate the LSH output.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import jaccard, md5_long, word_shingles

MERSENNE31 = 2147483647  # permutation modulus P


def fan_out_small_input(docs: DataFrame) -> DataFrame:
    """Repartition a few-partition input so CPU-heavy per-doc stages
    (signatures, shingle verification) use every core.

    A small table often arrives as one file → one partition, which would
    serialize minutes of single-core work.  At cluster scale the input is
    already wide and this is a no-op.  The fan-out floor is ~16 KiB of
    compressed input per task: signatures cost ~1 ms/doc vs ~120 B/doc of
    input, while a warm Python-worker round trip is only milliseconds.
    """
    target = docs.sparkSession.sparkContext.defaultParallelism
    try:
        nbytes = sum(os.path.getsize(f.removeprefix("file://"))
                     for f in docs.inputFiles())
        target = min(target, max(1, nbytes >> 14))
    except Exception:
        pass  # derived frame / non-local files: keep full parallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    return docs


def _const(tag: str, i: int, mod: int) -> int:
    """Deterministic permutation constant from md5 — reproducible anywhere."""
    return int(hashlib.md5(f"{tag}#{i}".encode()).hexdigest()[:15], 16) % mod


def permutation_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    a = [_const("a", i, MERSENNE31 - 1) + 1 for i in range(num_hashes)]
    b = [_const("b", i, MERSENNE31) for i in range(num_hashes)]
    return a, b


def _base_hash(shingle: F.Column, fast_hash: bool) -> F.Column:
    """Shingle → [0, P) integer.  md5 is DuckDB-portable (the signature-
    exposing oracle query reproduces it); xxhash64 is JVM-native and ~20×
    cheaper for pipelines where only derived *pairs* are checked."""
    if fast_hash:
        return F.pmod(F.xxhash64(shingle), F.lit(MERSENNE31))
    return md5_long(shingle) % MERSENNE31


def signature_only(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_w: int = 3,
    fast_hash: bool = False,
    shingle_fn=None,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) per document.

    `shingle_fn` (Column → array Column) overrides the shingling unit —
    default is distinct w-word shingles; pass e.g. char_ngrams for
    character-level near-dup detection.

    Two physical strategies, same values for the same base hash:

    - Portable path (fast_hash=False): shingles explode to (id, h) rows —
      base hash computed ONCE per shingle, codegen'd — and the N
      permutation minima run as N `min` aggregates in one map-side-
      combined hash aggregate.  (A transform(sequence(1,N), ...) HOF
      expression would run interpreted and re-hash every shingle per
      permutation — ~30 ms/doc at N=128, measured.)  Pure JVM, DuckDB-
      reproducible, but N aggregate expressions cost seconds of Janino
      compile per plan.

    - Fast path (fast_hash=True): base hashes still JVM-side (xxhash64,
      codegen'd), then one Arrow-batched pandas UDF computes all N
      permutation minima per doc with numpy — no wide aggregate to
      compile, no shuffle at all; signatures stay fully deterministic.
    """
    a, b = permutation_constants(num_hashes)
    shingles = (shingle_fn or (lambda c: word_shingles(c, w=shingle_w)))(
        F.col(text_col))
    docs = fan_out_small_input(docs)

    if fast_hash:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        av = np.asarray(a, dtype="int64")[:, None]
        bv = np.asarray(b, dtype="int64")[:, None]

        def sig(hs):
            arrs = hs.to_numpy()
            if len(arrs) == 0:
                return pd.Series([], dtype=object)
            lens = np.fromiter((len(h) for h in arrs), dtype=np.int64,
                               count=len(arrs))
            if (lens == 0).any():
                # degenerate empty-shingle docs: per-doc loop (rare path)
                out = []
                for h in arrs:
                    hv = np.asarray(h, dtype="int64")[None, :]
                    m = (av * hv + bv) % MERSENNE31
                    out.append(m.min(axis=1) if hv.size else
                               np.full(av.shape[0], MERSENNE31 - 1))
                return pd.Series(out)
            # One batched matmul-shaped pass over every shingle in the
            # Arrow batch, then segmented min per doc — no Python loop.
            flat = np.concatenate([np.asarray(h, dtype="int64")
                                   for h in arrs])[None, :]
            offsets = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            mins = np.minimum.reduceat((av * flat + bv) % MERSENNE31,
                                       offsets, axis=1)
            return pd.Series(list(mins.T))

        sig.__annotations__ = {"hs": pd.Series, "return": pd.Series}
        sig_udf = pandas_udf(sig, "array<long>")
        hashed = F.transform(shingles, lambda s: _base_hash(s, True))
        return docs.select(F.col(id_col).alias("id"),
                           sig_udf(hashed).alias("sig"))

    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(shingles,
                              lambda s: _base_hash(s, fast_hash))).alias("h"),
    )
    mins = exploded.groupBy("id").agg(*[
        F.min((F.lit(a[i]) * F.col("h") + F.lit(b[i])) % MERSENNE31)
        .alias(f"_m{i}")
        for i in range(num_hashes)
    ])
    return mins.select(
        "id", F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_w: int = 3,
    fast_hash: bool = False,
    shingle_fn=None,
) -> DataFrame:
    """(id, shingles, sig: array<long>[num_hashes]) per document."""
    sig = signature_only(docs, text_col, id_col, num_hashes, shingle_w,
                         fast_hash, shingle_fn)
    shingler = shingle_fn or (lambda c: word_shingles(c, w=shingle_w))
    sh = docs.select(F.col(id_col).alias("id"),
                     shingler(F.col(text_col)).alias("shingles"))
    return sh.join(sig, "id").select("id", "shingles", "sig")


def banded_frame(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, band_key) rows from a signature frame.

    Unrolled polynomial band key (acc = acc·(P+2) mod 2⁶¹−1 + xᵢ): plain
    arithmetic on element_at stays in codegen; an F.aggregate fold here
    ran interpreted for bands × rows per doc."""
    band_key = F.lit(0).cast("long")
    for r in range(rows_per_band):
        x = F.element_at(F.col("sig"), F.col("band") * rows_per_band + r + 1)
        band_key = band_key * (MERSENNE31 + 2) % (2**61 - 1) + x
    return (
        sigs.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
            "sig",
        )
        .select("id", "band", band_key.alias("band_key"))
    )


def minhash_lsh_pairs_cross(
    corpus: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 64,
    shingle_w: int = 3,
    shingle_fn=None,
) -> DataFrame:
    """Incremental dedup: near-dup pairs BETWEEN a new batch and an
    existing corpus — (corpus_id, new_id, jacc) with jacc ≥ threshold.

    This is the production ingestion mode: the corpus side's signatures
    are a stored artifact in practice (recompute here for self-
    containment; `signature_only` is the thing you'd persist), and the
    band join is A×B only — no corpus×corpus or batch×batch pair
    enumeration ever happens, so incremental cost scales with the batch,
    not the corpus.  Verification shingles only docs that appear in a
    surviving candidate pair, same as the self-join form.  Hot-bucket
    mitigation composes exactly as in `minhash_lsh_pairs` (hash-split the
    bucket members per side); omitted here because the cross bucket
    product is already bounded by the small batch side.
    """
    rows_per_band = num_hashes // bands
    corpus = fan_out_small_input(corpus)
    new_docs = fan_out_small_input(new_docs)
    shingler = shingle_fn or (lambda c: word_shingles(c, w=shingle_w))

    banded_a = banded_frame(
        signature_only(corpus, text_col, id_col, num_hashes, shingle_w,
                       fast_hash=True, shingle_fn=shingle_fn),
        bands, rows_per_band)
    banded_b = banded_frame(
        signature_only(new_docs, text_col, id_col, num_hashes, shingle_w,
                       fast_hash=True, shingle_fn=shingle_fn),
        bands, rows_per_band).withColumnRenamed("id", "id_new")

    candidates = (
        banded_a.join(banded_b, ["band", "band_key"])
        .select(F.col("id").alias("corpus_id"), F.col("id_new").alias("new_id"))
        .distinct()
        .persist()
    )
    candidates.count()

    def survivors(side: DataFrame, key: str, out: str) -> DataFrame:
        ids = candidates.select(F.col(key).alias("id")).distinct()
        return (side.join(F.broadcast(ids), side[id_col] == ids["id"],
                          "left_semi")
                .select(F.col(id_col).alias(key),
                        shingler(F.col(text_col)).alias(out)))

    sh_a = survivors(corpus, "corpus_id", "sh_a")
    sh_b = survivors(new_docs, "new_id", "sh_b")
    return (
        sh_a.join(F.broadcast(candidates), "corpus_id")
        .join(F.broadcast(sh_b), "new_id")
        .withColumn("jacc", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jacc") >= threshold)
        .select("corpus_id", "new_id", "jacc")
    )


_M64 = (1 << 64) - 1


def _mix64_u64(x):
    """splitmix64 finalizer over a numpy int array → uint64 hashes.

    The hot-bucket split function: chosen because it is computable
    IDENTICALLY in vectorized numpy (here) and in a pandas UDF (the
    bounded-gather pre-split), so both physical strategies assign every
    member to the same subgroup.  (A JVM-side expression form is ruled
    out by ANSI mode: wrap-around long multiplication raises
    ARITHMETIC_OVERFLOW under Spark 4 defaults.)"""
    import numpy as np

    x = (x.astype("uint64") + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_M64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_M64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(_M64)
    return x ^ (x >> np.uint64(31))


def _mix64_grp_udf():
    """pandas UDF (id, n_groups) → subgroup, matching `_mix64_u64 % n`
    exactly; NULL/≤1 n_groups (non-oversized buckets) map to group 0."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def grp(ids, ngroups):
        n = ngroups.fillna(1).to_numpy(dtype="int64")
        h = _mix64_u64(ids.to_numpy(dtype="int64"))
        out = np.where(n > 1, (h % np.maximum(n, 1).astype("uint64"))
                       .astype("int64"), 0)
        return pd.Series(out.astype("int32"))

    grp.__annotations__ = {"ids": pd.Series, "ngroups": pd.Series,
                           "return": pd.Series}
    return pandas_udf(grp, "int")


def _pairs_from_id_arrays(buckets: DataFrame, ids_col: str,
                          max_bucket: int, oversized_acc=None) -> DataFrame:
    """Enumerate intra-bucket candidate pairs (id_a < id_b) from a frame
    of sorted id arrays — vectorized numpy (`triu_indices`) per Arrow
    batch via mapInPandas.

    The nested `transform(slice(...))` SQL HOF this replaces ran
    interpreted (HOF lambdas are excluded from whole-stage codegen) at
    ~1.4 s per call at bench SF; numpy enumerates the same pairs in
    milliseconds.  Buckets larger than ``max_bucket`` are hash-split into
    ceil(n/max_bucket) subgroups first (splitmix64 of the member id —
    deterministic everywhere), preserving the documented hot-bucket
    bound: pair count per bucket drops from O(n²) to O(n·max_bucket),
    and cross-subgroup near-dup pairs rely on the other bands."""
    import numpy as np
    import pandas as pd

    mix64 = _mix64_u64

    def enumerate_pairs(batches):
        for pdf in batches:
            out_a, out_b = [], []
            for ids in pdf[ids_col]:
                ids = np.asarray(ids, dtype="int64")
                n = len(ids)
                if n < 2:
                    continue
                n_groups = -(-n // max_bucket)  # ceil
                if n_groups > 1 and oversized_acc is not None:
                    # split-recall loss must be observable without a
                    # second counting job over the bucket aggregation
                    oversized_acc.add(1)
                groups = ([ids] if n_groups == 1 else
                          [ids[(mix64(ids) % np.uint64(n_groups))
                               == np.uint64(g)] for g in range(n_groups)])
                for g in groups:
                    if len(g) < 2:
                        continue
                    ia, ib = np.triu_indices(len(g), k=1)
                    out_a.append(g[ia])  # g sorted -> id_a < id_b
                    out_b.append(g[ib])
            if out_a:
                yield pd.DataFrame({"id_a": np.concatenate(out_a),
                                    "id_b": np.concatenate(out_b)})

    return buckets.select(ids_col).mapInPandas(
        enumerate_pairs, "id_a long, id_b long")


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 64,
    shingle_w: int = 3,
    max_bucket: int = 1000,
    shingle_fn=None,
    bounded_gather: bool = False,
    signature_stage: tuple[str, str] | None = None,
) -> DataFrame:
    """Verified near-duplicate pairs: (id_a, id_b, jacc) with jacc ≥ threshold.

    jacc is the EXACT shingle-set Jaccard of each LSH candidate pair —
    LSH only prunes the pair space; it never decides similarity.

    The signature frame's lineage is referenced twice (both sides of the
    band self-join), so it is persisted.  Signatures use xxhash64
    (fast_hash): this operator's contract is the verified pair set, which
    the exact Jaccard step decides, so the base hash only needs
    determinism, not oracle portability.  The verify step joins the
    (small) candidate set against per-doc shingle arrays — candidates
    broadcast, so the shingle arrays never shuffle.

    ``signature_stage=(key_path, fingerprint)`` persists the signature
    frame as a staged parquet artifact (tmpstage.stage_or_read):
    signatures are a pure function of the corpus, and in production they
    are computed once at ingest and stored — every dedup run after the
    first reads the artifact instead of re-shingling the corpus.
    """
    rows_per_band = num_hashes // bands
    # Fan out ONCE here: both the signature stage and the verify stage's
    # shingle recomputation are CPU-bound per-doc work that would
    # otherwise inherit the input file's (possibly single) partitioning.
    docs = fan_out_small_input(docs)
    staged_shingles = None
    if signature_stage is not None:
        from ..tmpstage import stage_or_read

        key_path, fingerprint = signature_stage
        # One artifact serves both stages: banded hashing reads only the
        # `sig` column (parquet column pruning skips the shingles), the
        # verify step reads only `shingles` — neither recomputes per-doc
        # CPU work on a warm corpus.
        staged = stage_or_read(
            docs.sparkSession, "minhash_sigs", key_path, fingerprint,
            lambda: minhash_signatures(docs, text_col, id_col, num_hashes,
                                       shingle_w, fast_hash=True,
                                       shingle_fn=shingle_fn))
        sigs = staged.select("id", "sig")
        staged_shingles = staged.select("id", "shingles")
    else:
        sigs = signature_only(docs, text_col, id_col, num_hashes, shingle_w,
                              fast_hash=True, shingle_fn=shingle_fn)
    if bounded_gather:
        # The two-pass path reads the signatures twice (bucket-size
        # pre-pass + main bucket pass); the default path reads them once.
        sigs = sigs.persist()

    banded = banded_frame(sigs, bands, rows_per_band)
    # Oversized-bucket handling: a boilerplate band key shared by millions
    # of docs would enumerate O(n²) pairs in one bucket.  Instead of
    # silently slicing members away (round-1 advice: that quietly voids
    # the exhaustive-oracle equivalence), oversized buckets sub-partition
    # their members by member-id hash into ceil(n/max_bucket) groups:
    # every member keeps pair coverage inside its group (~max_bucket
    # peers) and the pair count per hot bucket drops to O(n·max_bucket).
    # Cross-group pairs of an oversized bucket rely on the other bands-1
    # band keys — with 64 bands a true near-dup pair has many independent
    # chances to collide in a non-hot bucket.
    #
    # Two physical strategies, same semantics:
    # - default (one shuffle): full collect_list per bucket, split
    #   in-array afterwards.  The hot bucket's member ARRAY still lands in
    #   one reduce task (ids only — 8 B/member, so a 10M-member bucket is
    #   an 80 MB array: survivable, and measured 1.6× faster end-to-end
    #   than the two-pass form at bench SF).
    # - bounded_gather=True (two passes): a counting pre-pass finds hot
    #   keys (broadcast — hot keys are few by nature), members split
    #   BEFORE grouping, so no reduce task ever collects more than
    #   ~max_bucket ids.  For corpora where even the id array of a hot
    #   bucket is too big for one task; costs an extra pass + logs the
    #   number of split buckets.
    if bounded_gather:
        oversized = (
            banded.groupBy("band", "band_key")
            .agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > max_bucket)
            .withColumn("n_groups",
                        F.ceil(F.col("n_members") / max_bucket).cast("int"))
            .persist()
        )
        grp = _mix64_grp_udf()(F.col("id"), F.col("n_groups"))
        buckets = (
            banded.join(F.broadcast(oversized.select("band", "band_key",
                                                     "n_groups")),
                        ["band", "band_key"], "left")
            .withColumn("grp", grp)
            .groupBy("band", "band_key", "grp")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        raw_pairs = _pairs_from_id_arrays(buckets, "ids", max_bucket)
    else:
        # One shuffle builds each bucket's member list (sorted for
        # determinism); pair enumeration + hot-bucket splitting happen
        # vectorized in _pairs_from_id_arrays, and the oversized-bucket
        # count rides along in an accumulator — the whole
        # sigs → band → group → pairs → distinct chain is ONE fused job
        # with no mid-pipeline persist barrier or second counting pass.
        split_acc = docs.sparkSession.sparkContext.accumulator(0)
        bucket_agg = (
            banded.groupBy("band", "band_key")
            .agg(F.sort_array(F.collect_list("id")).alias("all_ids"))
            .filter(F.size("all_ids") > 1)
        )
        raw_pairs = _pairs_from_id_arrays(bucket_agg, "all_ids", max_bucket,
                                          oversized_acc=split_acc)
    # Persisted AND eagerly materialized: the verify step references this
    # frame from three broadcast builds, and Spark runs broadcast-exchange
    # jobs concurrently — without the count() they would race past the
    # unpopulated cache and each recompute the whole signature pipeline.
    # The frame is tiny after LSH pruning (pairs, not documents).
    candidates = raw_pairs.distinct().persist()
    candidates.count()

    def _warn_split(n_over: int) -> None:
        if n_over:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: %d LSH buckets exceeded max_bucket=%d "
                "and were hash-split into subgroups; cross-subgroup pairs "
                "in those buckets rely on the remaining bands",
                n_over, max_bucket)

    if bounded_gather:
        _warn_split(oversized.count())
        oversized.unpersist()
        sigs.unpersist()
    else:
        # candidates.count() above ran the pair enumeration, so the
        # accumulator already carries the oversized-bucket total
        _warn_split(split_acc.value)

    # Shingle ONLY the docs that appear in some candidate pair (a
    # broadcast semi-join on the candidate id set), not the whole corpus
    # — LSH's survivor set is tiny relative to the input, and shingling
    # is the expensive part of verification.  With a staged artifact the
    # shingles are already materialized columnar — the semi-join prunes
    # the parquet read instead.
    cand_ids = candidates.select(
        F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    if staged_shingles is not None:
        sh = staged_shingles.join(F.broadcast(cand_ids), "id", "left_semi")
    else:
        sh = (
            docs.join(F.broadcast(cand_ids),
                      docs[id_col] == cand_ids["id"], "left_semi")
            .select(
                F.col(id_col).alias("id"),
                (shingle_fn or (lambda c: word_shingles(c, w=shingle_w)))(
                    F.col(text_col)).alias("shingles"))
        )
    with_a = (
        sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
        .join(F.broadcast(candidates), "id_a")
    )
    verified = (
        sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
        .join(F.broadcast(with_a), "id_b")
        .withColumn("jacc", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jacc") >= threshold)
        .select("id_a", "id_b", "jacc")
    )
    return verified
