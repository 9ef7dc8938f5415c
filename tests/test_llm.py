"""LLM-pipeline operator checks: LSH recall vs brute force, approx sketch
error bounds, multimodal stub plumbing, NumPy cross-oracles
(SURVEY.md §5.2.5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_database_for_sql_spark.catalog import load_table
from distributed_database_for_sql_spark.operators.ann import (
    brute_force_topk,
    lsh_bucketed_topk,
)
from distributed_database_for_sql_spark.operators.minhash import minhash_lsh_pairs
from distributed_database_for_sql_spark.sources.multimodal import (
    attach_binary_payload,
    extract_image_meta,
    fake_image_meta,
    sample_frames,
)


def test_minhash_lsh_equals_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lsh = {(r.id_a, r.id_b) for r in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # NumPy/pure-Python exhaustive oracle on collected docs
    rows = docs.select("doc_id", "text").collect()
    sh = {}
    for r in rows:
        toks = r.text.split(" ")
        sh[r.doc_id] = (set(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
                        if len(toks) >= 3 else {r.text})
    exact = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                exact.add((a, b))
    assert lsh == exact


def test_minhash_oversized_bucket_split_keeps_members(spark, sf_dir):
    """With max_bucket tiny, hot buckets hash-split into subgroups instead
    of silently dropping members past the cap: near-dup pairs must still
    surface (via subgroup peers or other bands), and the un-split result
    on the same corpus stays the reference."""
    docs = load_table(spark, sf_dir, "documents").limit(400)
    ref = {(r.id_a, r.id_b) for r in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    split = {(r.id_a, r.id_b) for r in
             minhash_lsh_pairs(docs, threshold=0.5, max_bucket=3).collect()}
    # Every split-mode pair is a true pair (verify step is exact) …
    assert split <= ref
    # … and recall through 64 bands survives aggressive splitting.
    if ref:
        assert len(split) / len(ref) >= 0.9, (len(split), len(ref))
    # The bounded-gather (two-pass) strategy must produce the identical
    # pair set: same hash-split semantics, different physical plan.
    bounded = {(r.id_a, r.id_b) for r in
               minhash_lsh_pairs(docs, threshold=0.5, max_bucket=3,
                                 bounded_gather=True).collect()}
    assert bounded == split


def test_ann_brute_force_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    got = brute_force_topk(emb, queries, k=3).collect()
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(5):
        qv = m[ids == qid][0]
        cos = m @ qv
        order = sorted(
            [(round(c, 6), i) for c, i in zip(cos, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:3]
        mine = [(r.neighbor_id, r.cos) for r in sorted(
            (g for g in got if g.query_id == qid), key=lambda r: r.rn)]
        assert [(i, c) for c, i in order] == [(i, pytest.approx(c, abs=1e-6))
                                              for i, c in mine]


def test_lsh_ann_subset_of_bruteforce_space(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select("vec_id")
    out = lsh_bucketed_topk(emb, queries, k=5).collect()
    # determinism: same call twice gives identical rows
    out2 = lsh_bucketed_topk(emb, queries, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # every returned neighbor must share the query's bucket → cos is real
    for r in out:
        assert r.query_id != r.neighbor_id
        assert -1.0 <= r.cos <= 1.0


def test_approx_count_distinct_error_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", 0.05).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.15  # 3× the target rsd


def test_multimodal_fake_meta_is_deterministic(spark, sf_dir):
    assert fake_image_meta(b"hello") == fake_image_meta(b"hello")

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    meta = {r.doc_id: (r.width, r.height, r.channels)
            for r in extract_image_meta(media).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert meta[r.doc_id] == fake_image_meta(r.text.encode())


def test_bmp_codec_roundtrip_exact():
    """encode_bmp/decode_bmp must invert each other bit-exactly, including
    the non-trivial cases: odd widths (row padding) and channel order."""
    import numpy as np

    from distributed_database_for_sql_spark.sources.multimodal import (
        decode_bmp, encode_bmp, synthetic_pixels)

    for doc_id, w, h in [(0, 8, 6), (7, 9, 7), (123, 13, 10), (5, 1, 1)]:
        px = synthetic_pixels(doc_id, w, h)
        back = decode_bmp(encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, px)
    # a red-only image must decode as red-only (BGR order handled)
    red = np.zeros((2, 2, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    back = decode_bmp(encode_bmp(red))
    assert back[:, :, 0].min() == 200 and back[:, :, 1:].max() == 0
    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap")


def test_bmp_meta_through_real_decoder(spark, sf_dir):
    from distributed_database_for_sql_spark.sources.multimodal import (
        attach_bmp_payload, extract_image_meta)

    docs = load_table(spark, sf_dir, "documents").limit(15)
    media = attach_bmp_payload(docs).withColumn("content_md5", F.md5("payload"))
    meta = {r.doc_id: (r.width, r.height, r.channels)
            for r in extract_image_meta(media, use_stub=False).collect()}
    for doc_id, dims in meta.items():
        assert dims == (8 + doc_id % 9, 6 + doc_id % 5, 3)


def test_frame_sampling_covers_payload_prefix(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_binary_payload(docs)
    frames = sample_frames(media, frame_size=100, max_frames=3).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    for doc_id, fr in by_doc.items():
        fr.sort(key=lambda r: r.frame_idx)
        joined = b"".join(bytes(r.frame_bytes) for r in fr)
        assert texts[doc_id].startswith(joined)
        assert len(fr) == min(3, (len(texts[doc_id]) + 99) // 100)


def test_multimodal_resize_bytes_match_python_kernel(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.sources.multimodal import (
        attach_binary_payload,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    got = {r.doc_id: bytes(r.resized_bytes)
           for r in resize_images(media, 8, 8, 3).collect()}
    out_len = 8 * 8 * 3
    for r in media.collect():
        payload, n = bytes(r.payload), len(bytes(r.payload))
        want = bytes(payload[(i * n) // out_len] for i in range(out_len))
        assert got[r.doc_id] == want


def test_ivf_kmeans_recall_vs_brute_force(spark, sf_dir):
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.operators.ann import brute_force_topk
    from distributed_database_for_sql_spark.operators.ivf import ivf_topk
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, queries, k=5, n_clusters=8, nprobe=4).collect()}
    # Probing half the cells must recover a solid fraction of true top-5.
    # Floor raised 0.5 → 0.7 in r6 with farthest-point seeding (the
    # lowest-id-k seeds often shared one dense region); the fit is
    # deterministic, so run-to-run variance is zero — only a data regen
    # moves this number (measured 0.76 at the test SF).
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall {recall}"
    # And the result is deterministic across runs.
    approx2 = {(r.query_id, r.neighbor_id)
               for r in ivf_topk(emb, queries, k=5, n_clusters=8, nprobe=4).collect()}
    assert approx == approx2


def test_pq_adc_recall_and_encode_consistency(spark, sf_dir):
    import numpy as np

    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.operators.ann import brute_force_topk
    from distributed_database_for_sql_spark.operators.pq import (
        pq_adc_topk,
        pq_encode_udf,
        pq_fit,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in pq_adc_topk(emb, queries, k=5).collect()}
    # 8×32 codebooks + 10k-candidate exact re-rank: measured 0.82 on this
    # (near-random, VQ-worst-case) corpus; 0.7 leaves headroom for any
    # tie-order drift.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall {recall}"
    # Deterministic end to end (deterministic init + fixed iteration count).
    approx2 = {(r.query_id, r.neighbor_id)
               for r in pq_adc_topk(emb, queries, k=5).collect()}
    assert approx == approx2

    # Spark-side encoding must equal a pure-numpy re-encoding.
    books = pq_fit(emb, m=8, k=16, iters=2)
    coded = {r.vec_id: list(r.codes) for r in emb.select(
        "vec_id", pq_encode_udf(books)(
            F.col("embedding").cast("array<double>")).alias("codes")).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    C = np.asarray(books)
    c2 = (C * C).sum(axis=2)
    for r in rows[:50]:
        V = np.asarray(r.embedding, dtype="float64")
        V = (V / np.linalg.norm(V)).reshape(8, 8)
        want = [int((c2[s] - 2.0 * (C[s] @ V[s])).argmin()) for s in range(8)]
        assert coded[r.vec_id] == want, r.vec_id


def test_multimodal_feature_extract_matches_numpy(spark, sf_dir):
    import numpy as np

    from distributed_database_for_sql_spark.sources.multimodal import (
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    got = {r.doc_id: r for r in extract_features(media, n_bins=4).collect()}
    edges = np.linspace(0, 256, 5)
    for r in media.collect():
        b = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        row = got[r.doc_id]
        assert row.mean_byte == pytest.approx(float(b.mean()))
        assert row.std_byte == pytest.approx(float(b.std()))
        assert list(row.byte_hist) == np.histogram(b, bins=edges)[0].tolist()
        assert sum(row.byte_hist) == len(b) == row.n_bytes


def test_compression_ratio_matches_zlib(spark, sf_dir):
    import zlib

    from distributed_database_for_sql_spark.queries import registry

    rows = registry()["text_compression_ratio"].fn(spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in
            load_table(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    for r in rows[:100]:
        t = docs[r.doc_id]
        if not t:
            assert r.zlib_ratio is None
            continue
        raw = t.encode("utf-8")
        assert r.zlib_ratio == round(len(zlib.compress(raw, 6)) / len(raw), 6)


def test_pq_adc_chunked_broadcast_fallback_matches_default(spark, sf_dir):
    """Above max_broadcast_queries the ADC scan hash-splits the query set
    into bounded broadcast chunks and unions the scans — the result must
    be identical to the single-broadcast default."""
    from distributed_database_for_sql_spark.operators.pq import pq_adc_topk
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    base = {(r.query_id, r.neighbor_id, r.cos, r.rn)
            for r in pq_adc_topk(emb, queries, k=5).collect()}
    chunked = {(r.query_id, r.neighbor_id, r.cos, r.rn)
               for r in pq_adc_topk(emb, queries, k=5,
                                    max_broadcast_queries=3).collect()}
    assert chunked == base


def test_ivf_topk_shuffle_join_matches_broadcast(spark, sf_dir):
    """broadcast_queries=False routes the probe side through a plain
    shuffle equi-join on cell (the corpus-sized-query form) with an
    identical result, and the plan really loses the broadcast."""
    from distributed_database_for_sql_spark.operators.ivf import ivf_topk
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    kw = dict(k=5, n_clusters=8, nprobe=4)
    bcast = {(r.query_id, r.neighbor_id, r.cos, r.rn)
             for r in ivf_topk(emb, queries, **kw).collect()}
    shuffled_df = ivf_topk(emb, queries, broadcast_queries=False, **kw)
    assert {(r.query_id, r.neighbor_id, r.cos, r.rn)
            for r in shuffled_df.collect()} == bcast


def test_minhash_split_warning_on_default_path(spark, sf_dir, caplog):
    """The oversized-bucket split warning must fire on the default
    (one-shuffle) strategy too, not only under bounded_gather — silent
    recall loss has to be observable on both physical plans."""
    import logging

    docs = load_table(spark, sf_dir, "documents").limit(200)
    with caplog.at_level(logging.WARNING,
                         logger="distributed_database_for_sql_spark.operators.minhash"):
        minhash_lsh_pairs(docs, threshold=0.5, max_bucket=2).collect()
    assert any("hash-split" in r.message for r in caplog.records)


def test_registry_ann_queries_report_recall_column(spark, sf_dir):
    """The two no-oracle ANN registry queries carry per-query recall_at_k
    vs brute force in their own output, above the operator floors."""
    from distributed_database_for_sql_spark.queries import registry

    # Measured at sf0.01 on the near-random synthetic corpus: LSH mean 0.5
    # (OR-amplified 4-bit bands prune hard), IVF mean 0.92.
    for name, floor in (("ann_lsh_bucketed_topk", 0.3),
                        ("ann_ivf_kmeans_topk", 0.5)):
        rows = registry()[name].fn(spark, sf_dir).collect()
        assert rows and all(0.0 <= r.recall_at_k <= 1.0 for r in rows)
        mean = sum(r.recall_at_k for r in rows) / len(rows)
        assert mean >= floor, (name, mean)


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    """IVF-PQ (both prunings composed) keeps a solid recall floor vs the
    exact top-5 and is deterministic across runs; the registry query's
    in-output recall column stays above the same floor."""
    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.operators.ann import brute_force_topk
    from distributed_database_for_sql_spark.operators.ivfpq import ivfpq_topk
    from distributed_database_for_sql_spark.queries import registry
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}

    def run():
        return {(r.query_id, r.neighbor_id)
                for r in ivfpq_topk(emb, queries, k=5, n_clusters=16,
                                    nprobe=4, m=8, n_codes=32).collect()}

    approx = run()
    # Measured 0.92 mean at sf0.01; 0.6 floors the composed pruning.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall}"
    assert approx == run()

    rows = registry()["ann_ivfpq_topk"].fn(spark, sf_dir).collect()
    assert rows and all(0.0 <= r.recall_at_k <= 1.0 for r in rows)
    mean = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean >= 0.6, mean


def test_semantic_dedup_matches_numpy(spark, sf_dir):
    """semantic_dedup's labeling == a numpy recomputation of the same
    rule (dup iff some lower-id same-cell item has cos >= t), and
    survivors are never marked dup_of anything higher."""
    import numpy as np

    from distributed_database_for_sql_spark.catalog import load_table
    from distributed_database_for_sql_spark.operators.semdedup import (
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.vec_id: r for r in
           semantic_dedup(emb, threshold=0.4, n_clusters=8).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    V = {r.vec_id: np.asarray(r.embedding, dtype="float64") for r in rows}
    cells = {}
    for vid, r in got.items():
        cells.setdefault(r.cell, []).append(vid)
    for cell, ids in cells.items():
        ids.sort()
        for i, hi in enumerate(ids):
            dup_of = None
            for lo in ids[:i]:
                a, b = V[lo], V[hi]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= 0.4:
                    dup_of = lo
                    break
            r = got[hi]
            assert r.is_dup == (dup_of is not None), hi
            assert r.dup_of == dup_of, hi
