"""Training-corpus curation operators beyond dedup: benchmark
decontamination, sequence packing, PII redaction, repetition scoring.

These are the remaining first-class operations a 100 TB pretraining
pipeline runs between raw crawl and the data loader (the dedup family
lives in llm_dedup.py, quality/langid in text_analysis.py):

- decontamination: drop/flag training docs that share long n-grams with
  an evaluation benchmark — candidate generation is an equi-join on
  hashed n-grams with the (small) benchmark side broadcast, the same
  shape at 100 TB.
- sequence packing: the concat-and-chunk packing used to fill model
  context windows — a per-lang running token sum (one window shuffle)
  assigns every doc its pack id and offset; no state, no driver loop.
- PII redaction: streaming-safe regexp scrubbing, pure JVM row-local
  expressions (no shuffle at all).
- repetition: duplicated-n-gram ratio, the standard boilerplate /
  degenerate-text signal — row-local array HOFs, no shuffle.

The reference has no text surface at all (SURVEY.md §2.A/§2.D — a Go
Raft core); these extend the target inventory of SURVEY.md §2.C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, table_fingerprint
from .base import register

# 4-word shingles: long enough that sharing one is contamination-grade
# overlap on this corpus, short enough that sf0.001 still has hits.
_NGRAM_W = 4


def _ngrams(col_name: str, w: int):
    """Space-joined w-word shingles of a text column (codegen, no UDF)."""
    toks = f"split({col_name}, ' ')"
    return F.when(
        F.size(F.expr(toks)) >= w,
        F.expr(f"transform(sequence(1, size({toks}) - {w - 1}, 1), "
               f"i -> array_join(slice({toks}, i, {w}), ' '))"),
    ).otherwise(F.array(F.col(col_name)))


@register(
    "decontam_benchmark_overlap",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT ng
      FROM (
        SELECT unnest(CASE WHEN len(string_split(text,' ')) >= {_NGRAM_W}
               THEN [array_to_string(string_split(text,' ')[i:i+{_NGRAM_W - 1}],' ')
                     FOR i IN generate_series(1, len(string_split(text,' ')) - {_NGRAM_W - 1})]
               ELSE [text] END) AS ng
        FROM documents WHERE source = 'src0'
      )
    ), train AS (
      SELECT doc_id, unnest(CASE WHEN len(string_split(text,' ')) >= {_NGRAM_W}
             THEN list_distinct(
                  [array_to_string(string_split(text,' ')[i:i+{_NGRAM_W - 1}],' ')
                   FOR i IN generate_series(1, len(string_split(text,' ')) - {_NGRAM_W - 1})])
             ELSE [text] END) AS ng
      FROM documents WHERE source <> 'src0'
    )
    SELECT t.doc_id, COUNT(*) AS n_hits
    FROM train t JOIN bench b USING (ng)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("decontam", "ngram", "join", "llm"),
)
def decontam_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, how many distinct
    4-gram shingles it shares with the benchmark set (source='src0'
    plays the benchmark role).

    Plan shape for 100 TB: the benchmark n-gram set is small by nature
    (eval suites, not corpora) → distinct + broadcast; the training side
    explodes per-doc DISTINCT shingles and hash-joins — one shuffle for
    the per-doc count, nothing quadratic.  Real pipelines hash the
    shingles (xxhash64) instead of carrying strings; strings kept here
    for oracle portability."""
    from ..operators.minhash import fan_out_small_input

    # n-gram generation is CPU-bound per-doc work; a single-file input
    # would serialize both explodes onto one core.
    docs = fan_out_small_input(load_table(spark, sf_dir, "documents"))
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(_ngrams("text", _NGRAM_W)).alias("ng"))
        .distinct()
    )
    train = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id",
                F.explode(F.array_distinct(_ngrams("text", _NGRAM_W)))
                .alias("ng"))
    )
    return (
        train.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .orderBy("doc_id")
    )


@register(
    "pack_sequences_chunked",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS start_tok
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(start_tok // 512 AS BIGINT) AS pack_id,
           CAST(start_tok % 512 AS BIGINT)  AS pack_offset
    FROM cum
    ORDER BY doc_id
    """,
    tags=("packing", "window", "llm"),
)
def pack_sequences_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): concatenate each language's
    docs in doc_id order and cut the stream into 512-token context
    windows; each doc gets the pack id and offset where it starts.

    This is the packing used by large pretraining loaders (docs may span
    pack boundaries; no per-doc padding).  One window shuffle on
    (lang ⇒ sort doc_id) computes the exclusive running token sum;
    pack id / offset are then pure projection.  At 100 TB the partition
    key is (lang, shard) so no single ordering task sees the whole
    corpus — semantics per shard are identical."""
    docs = load_table(spark, sf_dir, "documents")
    w = (W.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    toks = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    cum = toks.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        cum.select(
            "doc_id", "lang", "n_tokens",
            (F.col("start_tok") / 512).cast("long").alias("pack_id"),
            (F.col("start_tok") % 512).cast("long").alias("pack_offset"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_pii_redact",
    oracle=r"""
    WITH enriched AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-01' || CAST(doc_id % 100 AS VARCHAR)
               AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+',
                            '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{2,}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(raw,
                '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+')) AS BIGINT)
             + CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{2,}')) AS BIGINT)
             AS n_redactions
    FROM enriched
    ORDER BY doc_id
    """,
    tags=("pii", "redaction", "text", "llm"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: scrub email addresses and phone-shaped digit runs,
    reporting how many spans each doc had.

    The corpus is synthetic word salad, so deterministic PII-shaped spans
    are appended per doc (both engines identically) before scrubbing —
    the operator under test is the redaction itself.  Pure row-local
    regexp expressions: zero shuffles, streams as-is, and the regex
    subset used ([A-Za-z0-9._]+, {m,n} counts) means Java regex and RE2
    agree byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    email_re = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+"
    phone_re = r"[0-9]{3}-[0-9]{2,}"
    raw = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-01"),
        (F.col("doc_id") % 100).cast("string"))
    enriched = docs.select("doc_id", raw.alias("raw"))
    n_red = (
        F.size(F.expr(f"regexp_extract_all(raw, '{email_re}', 0)"))
        + F.size(F.expr(f"regexp_extract_all(raw, '{phone_re}', 0)"))
    ).cast("long")
    return (
        enriched.select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace("raw", email_re, "<EMAIL>"),
                phone_re, "<PHONE>").alias("redacted"),
            n_red.alias("n_redactions"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_repetition_score",
    oracle="""
    WITH ng AS (
      SELECT doc_id, lang,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN [array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' ')) - 2)]
                  ELSE [text] END AS g
      FROM documents
    )
    SELECT doc_id, lang,
           ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 4)
             AS rep_ratio,
           CAST(len(g) - len(list_distinct(g)) AS BIGINT) AS n_dup_ngrams
    FROM ng
    ORDER BY doc_id
    """,
    tags=("repetition", "quality", "text", "llm"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: fraction of 3-gram occurrences that are
    duplicates of an earlier occurrence — the standard degenerate-text /
    boilerplate signal (high ratio ⇒ looping or templated text).

    Row-local array HOFs only (split → shingles → array_distinct): no
    shuffle, no UDF, scales linearly with corpus bytes."""
    docs = load_table(spark, sf_dir, "documents")
    g = _ngrams("text", 3)
    rep = 1.0 - F.size(F.array_distinct(g)).cast("double") / F.size(g)
    return (
        docs.select(
            "doc_id", "lang",
            F.round(rep, 4).alias("rep_ratio"),
            (F.size(g) - F.size(F.array_distinct(g))).cast("long")
            .alias("n_dup_ngrams"),
        )
        .orderBy("doc_id")
    )


@register(
    "ann_pq_adc_topk",
    oracle=None,  # learned-codebook path; recall pinned by pytest vs brute force
    tags=("similarity", "ann", "pq", "adc", "kmeans", "iterative", "llm"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): distributed subspace
    k-means codebooks (8 subspaces × 32 entries learned on unit vectors),
    5-byte/vector codes, ADC lookup-table scan, exact re-rank of 10·k
    candidates.  Rows-only driver check; tests/test_llm.py pins
    determinism, recall vs brute force, and numpy encode parity."""
    from ..operators.pq import pq_adc_topk
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return (pq_adc_topk(emb, queries, k=5,
                        cache_key=table_fingerprint(sf_dir, "embeddings"))
            .orderBy("query_id", "rn"))


@register(
    "split_train_val_test",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 15))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM assigned
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("split", "sampling", "llm"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-independent
    id hash — the reproducible split every training pipeline needs
    (re-running on a grown corpus keeps every old doc in its old split;
    no shuffle state, no RNG).

    Row-local md5 bucket (portable: same 60-bit hex prefix arithmetic on
    both engines) then one count aggregation.  At 100 TB the split column
    is written once as a partition column and costs nothing afterwards."""
    from ..functions.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit("#split"))) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS term
      FROM documents
    ), df AS (
      SELECT term, COUNT(*) AS doc_freq FROM tok GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), tf AS (
      SELECT lang, term, COUNT(*) AS lang_tf FROM tok GROUP BY lang, term
    ), scored AS (
      SELECT tf.lang, tf.term,
             ROUND(tf.lang_tf * ln((SELECT n_docs FROM n) * 1.0 / df.doc_freq), 6)
               AS tfidf
      FROM tf JOIN df USING (term)
    ), ranked AS (
      SELECT lang, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    )
    SELECT lang, term, tfidf, rn FROM ranked
    WHERE rn <= 5 ORDER BY lang, rn
    """,
    tags=("text", "tfidf", "join", "window", "llm"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most distinctive terms per language by TF-IDF (distinct-term
    presence counts, ln(N/df) idf) — the corpus-profiling twin of the raw
    frequency query.

    Two aggregations over one exploded-term frame (per-term document
    frequency, per-(lang, term) frequency), a broadcast join on the small
    df side, and a per-lang top-k window.  The idf N is a broadcast
    scalar.  Tie-break on term keeps rank order engine-stable."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"))
    tok = tok.persist()
    n_docs = docs.count()
    df_ = tok.groupBy("term").agg(F.count("*").alias("doc_freq"))
    tf = tok.groupBy("lang", "term").agg(F.count("*").alias("lang_tf"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .select(
            "lang", "term",
            F.round(F.col("lang_tf")
                    * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6)
            .alias("tfidf"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "term", "tfidf", "rn")
        .orderBy("lang", "rn")
    )


@register(
    "join_interval_maintenance",
    oracle="""
    WITH hours AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
    ), ivl AS (
      SELECT h + INTERVAL 30 MINUTE AS w_start,
             h + INTERVAL 90 MINUTE AS w_end
      FROM hours
    )
    SELECT w_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM ivl JOIN events e ON e.ts >= w_start AND e.ts < w_end
    GROUP BY w_start
    ORDER BY w_start
    """,
    tags=("join", "interval", "range", "binning", "timeseries"),
)
def join_interval_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via binning (operators/interval_join.py):
    per-hour maintenance windows [h+30min, h+90min) — deliberately
    crossing bin boundaries and overlapping each other — joined to the
    events that fall inside, then counted.

    The oracle is the naive BETWEEN range join; the Spark plan is the
    binned EQUI join (hour bins, exact containment as post-filter) —
    lossless, no BroadcastNestedLoopJoin/CartesianProduct (plan test),
    and bucketable by bin at 100 TB."""
    from ..operators.interval_join import interval_point_join

    events = load_table(spark, sf_dir, "events")
    intervals = (
        events.select(F.date_trunc("hour", "ts").alias("h")).distinct()
        .select(
            F.expr("h + INTERVAL 30 MINUTES").alias("w_start"),
            F.expr("h + INTERVAL 90 MINUTES").alias("w_end"),
        )
    )
    joined = interval_point_join(
        intervals, events, "w_start", "w_end", "ts", bin_seconds=3600)
    return (
        joined.groupBy("w_start")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("w_start")
    )


@register(
    "stream_interval_static_join",
    oracle="""
    WITH hours AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
    ), ivl AS (
      SELECT h + INTERVAL 30 MINUTE AS w_start,
             h + INTERVAL 90 MINUTE AS w_end
      FROM hours
    )
    SELECT w_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM ivl JOIN events e ON e.ts >= w_start AND e.ts < w_end
    GROUP BY w_start
    ORDER BY w_start
    """,
    tags=("streaming", "join", "interval", "binning"),
)
def stream_interval_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of join_interval_maintenance: the binned interval
    join applied to the events STREAM against static windows — same
    oracle, proving the operator is streaming-safe (stateless binning,
    stream-static equi join, complete-mode aggregate)."""
    from ..streaming import jobs

    return jobs.stream_interval_window_agg(spark, sf_dir).orderBy("w_start")


@register(
    "text_compression_ratio",
    # zlib does not exist in DuckDB, so the query stages a deterministic
    # sidecar parquet (md5(text) → byte lengths, written by the zlib UDF
    # itself, fingerprint-keyed per corpus generation) and the oracle
    # JOINS it back on md5(text).  The content-hash join key makes the
    # oracle sf-agnostic (any staged generation of the same text matches;
    # DISTINCT collapses duplicates across generations — zlib is
    # deterministic, so duplicates agree).  The rounded ratio is computed
    # with each engine's own half-away-from-zero ROUND over the SAME
    # integer pair, so the hash certifies the zlib pipeline end-to-end.
    oracle="""
    WITH side AS (
      SELECT DISTINCT text_md5, raw_len, zlib_len
      FROM read_parquet('/tmp/zlib_sidecar_*/*.parquet')
    )
    SELECT d.doc_id, d.lang,
           ROUND(CAST(s.zlib_len AS DOUBLE) / s.raw_len, 6) AS zlib_ratio
    FROM documents d JOIN side s ON md5(d.text) = s.text_md5
    WHERE length(d.text) > 0
    ORDER BY d.doc_id
    """,
    tags=("quality", "compression", "text", "llm"),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality signal: zlib-compressed size over raw size
    per doc (low ratio ⇒ repetitive/templated text, high ⇒ high-entropy
    noise; both ends get filtered in real pipelines).

    Arrow-batched pandas UDF (zlib level 6, byte-deterministic for a
    fixed zlib version) — row-local, no shuffle, linear scan at any
    scale.  tests/test_llm.py additionally pins values against direct
    zlib calls."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..catalog import table_path
    from ..tmpstage import stage_or_read

    def zlib_len(texts: "pd.Series") -> "pd.Series":
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            if t else None)

    zlib_len.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    zl_udf = pandas_udf(zlib_len, "long")
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0)
    # Sidecar for the DuckDB oracle: (md5(text), utf-8 byte length,
    # zlib length) — a deterministic function of the corpus, staged once
    # per generation.
    stage_or_read(
        spark, "zlib_sidecar", table_path(sf_dir, "documents"),
        table_fingerprint(sf_dir, "documents"),
        lambda: docs.select(
            F.md5("text").alias("text_md5"),
            F.octet_length("text").alias("raw_len"),
            zl_udf(F.col("text")).alias("zlib_len")).distinct())
    return (
        docs.select(
            "doc_id", "lang",
            F.round(zl_udf(F.col("text")).cast("double")
                    / F.octet_length("text"), 6).alias("zlib_ratio"))
        .orderBy("doc_id")
    )


@register(
    "dedup_incremental_cross",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM documents
    )
    SELECT a.doc_id AS corpus_id, b.doc_id AS new_id,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
             AS jacc
    FROM sh a JOIN sh b
      ON a.source <> 'src0' AND b.source = 'src0'
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    ORDER BY corpus_id, new_id
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "llm"),
)
def dedup_incremental_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: near-dup pairs between the incoming
    batch (source='src0' plays the new batch) and the existing corpus
    (every other source) via the A×B-only banded MinHash join
    (operators/minhash.py:minhash_lsh_pairs_cross).  The oracle is the
    brute-force cross-pairs exact Jaccard — LSH with 64 bands at
    threshold 0.5 must reproduce it exactly (miss probability ≈ 1e-8)."""
    from ..operators.minhash import minhash_lsh_pairs_cross

    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return (
        minhash_lsh_pairs_cross(corpus, new_batch, threshold=0.5)
        .select("corpus_id", "new_id", F.round("jacc", 6).alias("jacc"))
        .orderBy("corpus_id", "new_id")
    )


@register(
    "dedup_signature_store",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM documents
    )
    SELECT a.doc_id AS corpus_id, b.doc_id AS new_id,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
             AS jacc,
           (SELECT COUNT(*) * 64 FROM documents) AS store_rows
    FROM sh a JOIN sh b
      ON a.source <> 'src0' AND b.source = 'src0'
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    ORDER BY corpus_id, new_id
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "state", "acid", "llm"),
)
def dedup_signature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED-STATE ingestion dedup: the LSH band index lives in an
    ACID txlog table that outlives any one job — ingest N stores the
    corpus's (id, band, band_key) rows; ingest N+1 joins ONLY its batch
    bands against the stored index (cost ∝ batch, never corpus), exact-
    jaccard-verifies the candidates against the raw docs, and APPENDS
    its own bands so the state advances for ingest N+2.  This is the
    100 TB production shape `minhash_lsh_pairs_cross` recomputes for
    self-containment: signatures computed once per document EVER, the
    store versioned/time-travelable like any table.  The oracle is the
    brute-force cross-pairs exact Jaccard plus the store's final row
    count (64 bands × every document) — certifying both the pairs and
    that the state actually persisted."""
    from ..operators.minhash import (
        banded_frame,
        fan_out_small_input,
        jaccard,
        signature_only,
        word_shingles,
    )
    from ..sources.txlog import TxLogTable
    from ..tmpstage import staging_dir

    docs = load_table(spark, sf_dir, "documents")
    corpus = fan_out_small_input(docs.filter(F.col("source") != "src0"))
    batch = fan_out_small_input(docs.filter(F.col("source") == "src0"))

    def bands_of(side: DataFrame) -> DataFrame:
        return banded_frame(
            signature_only(side, num_hashes=128, fast_hash=True),
            bands=64, rows_per_band=2)

    # ingest 1: the corpus's band index becomes the persisted store
    store = TxLogTable.create(
        spark, staging_dir("dedup_sigstore", sf_dir), bands_of(corpus),
        overwrite=True)
    # ingest 2: batch bands probe the STORE (not the corpus docs) —
    # batch side broadcast, so the stored index is ONE scanned pass
    # and never shuffles (the property that keeps per-ingest cost flat
    # as the store grows toward corpus × bands rows)
    bands_b = bands_of(batch).withColumnRenamed("id", "id_new")
    candidates = (store.read()
                  .join(F.broadcast(bands_b), ["band", "band_key"])
                  .select(F.col("id").alias("corpus_id"),
                          F.col("id_new").alias("new_id"))
                  .distinct())
    shingler = lambda c: word_shingles(c, w=3)  # noqa: E731

    def survivors(side: DataFrame, key: str, out: str) -> DataFrame:
        ids = candidates.select(F.col(key).alias("doc_id")).distinct()
        return (side.join(F.broadcast(ids), "doc_id", "left_semi")
                .select(F.col("doc_id").alias(key),
                        shingler(F.col("text")).alias(out)))

    pairs = (survivors(corpus, "corpus_id", "sh_a")
             .join(F.broadcast(candidates), "corpus_id")
             .join(F.broadcast(survivors(batch, "new_id", "sh_b")),
                   "new_id")
             .withColumn("jacc", jaccard(F.col("sh_a"), F.col("sh_b")))
             .filter(F.col("jacc") >= 0.5))
    # the state advances: the batch's bands join the store
    store.append(bands_b.withColumnRenamed("id_new", "id"))
    n_store, _ = store.count_rows()
    return (pairs
            .select("corpus_id", "new_id",
                    F.round("jacc", 6).alias("jacc"))
            .withColumn("store_rows", F.lit(int(n_store)))
            .orderBy("corpus_id", "new_id"))


@register(
    "source_quota_sampling",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    )
    SELECT doc_id, source, rk FROM ranked
    WHERE rk <= 50
    ORDER BY source, rk
    """,
    tags=("curation", "sampling", "quota", "llm"),
)
def source_quota_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quotas: cap every source at 50 docs, picked by
    a deterministic md5(doc_id) rank — the domain-balancing step that
    stops a single crawl source from dominating the training mix.  One
    window shuffle on source; at 100 TB the same rank-and-filter runs
    per source partition (no global sort, no collect)."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select("doc_id", "source", "rk")
        .orderBy("source", "rk")
    )


@register(
    "token_length_histogram",
    oracle="""
    WITH t AS (
      SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT lang, CAST(FLOOR(LOG2(n_tokens)) AS INT) AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t
    GROUP BY lang, len_bucket
    ORDER BY lang, len_bucket
    """,
    tags=("curation", "tokens", "histogram", "llm"),
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution in power-of-two buckets per language —
    the length histogram that drives packing efficiency and batch-shape
    decisions.  A single partial+final aggregation; the bucket key keeps
    cardinality tiny regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return (
        docs.select("lang", n_tokens.alias("n_tokens"))
        .withColumn("len_bucket",
                    F.floor(F.log2(F.col("n_tokens"))).cast("int"))
        .groupBy("lang", "len_bucket")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("total_tokens"))
        .orderBy("lang", "len_bucket")
    )


@register(
    "quality_quantile_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             LEAST(length(text) / 500.0, 1.0) * 0.5
             + (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                           AS DOUBLE) / length(text)) * 0.5 AS q
      FROM documents
    ), cut AS (
      SELECT lang, QUANTILE_CONT(q, 0.5) AS q50 FROM scored GROUP BY lang
    )
    SELECT s.lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN s.q > c.q50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           ROUND(AVG(CASE WHEN s.q > c.q50 THEN s.q END), 4) AS kept_avg_q
    FROM scored s JOIN cut c USING (lang)
    GROUP BY s.lang
    ORDER BY s.lang
    """,
    tags=("curation", "quality", "quantile", "llm"),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality filtering: keep documents above their
    language's median quality score (length saturation + punctuation
    penalty).  The per-language median is an exact `percentile` here for
    oracle parity; at 100 TB it becomes `percentile_approx` (mergeable
    sketch) and the cut table — one row per language — broadcasts into
    the filter join, so the corpus is scanned once and never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    punct_r = (
        F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
        .cast("double") / n_chars
    )
    q = F.least(n_chars / 500.0, F.lit(1.0)) * 0.5 + (1.0 - punct_r) * 0.5
    scored = docs.select("doc_id", "lang", q.alias("q"))
    cut = scored.groupBy("lang").agg(
        F.expr("percentile(q, 0.5)").alias("q50"))
    kept = F.col("q") > F.col("q50")
    return (
        scored.join(F.broadcast(cut), "lang")
        .groupBy("lang")
        .agg(F.count("*").alias("n_total"),
             F.sum(kept.cast("long")).alias("n_kept"),
             F.round(F.avg(F.when(kept, F.col("q"))), 4).alias("kept_avg_q"))
        .orderBy("lang")
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
                 / COUNT(*), 4) AS dup_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("curation", "dedup", "stats", "llm"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source — the per-domain contamination
    metric that decides which crawl sources get down-weighted.  One
    groupBy with a distinct-count on the content hash; at 100 TB the
    distinct count switches to approx_count_distinct (HLL, mergeable)
    with no shape change."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct(F.md5("text")).alias("n_unique"))
        .withColumn(
            "dup_rate",
            F.round(1.0 - F.col("n_unique").cast("double") / F.col("n_docs"),
                    4))
        .orderBy("source")
    )


@register(
    "mix_domain_reweight",
    # keep_permille is exact integer arithmetic (LEAST/div over declared
    # integer weights), the keep decision is the portable 60-bit md5
    # bucket — no doubles anywhere.
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs,
             1 + CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 3
               AS weight
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n_docs) AS n, SUM(weight) AS w FROM counts
    ), rates AS (
      SELECT source, n_docs, weight,
             CAST(LEAST(1000,
                        (SELECT n FROM tot) * weight * 1000
                        // ((SELECT w FROM tot) * n_docs))
                  AS BIGINT) AS keep_permille
      FROM counts
    )
    SELECT r.source, r.n_docs, r.weight, r.keep_permille,
           COUNT(*) FILTER (
             WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#mix'),
                                   1, 15))::BIGINT % 1000 < r.keep_permille
           ) AS n_kept
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY r.source, r.n_docs, r.weight, r.keep_permille
    ORDER BY r.source
    """,
    tags=("sampling", "mixture", "curation", "llm"),
)
def mix_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: resample sources to DECLARED domain
    weights (the DoReMi / Pile-style "domain weights" step — here the
    weight table is derived deterministically from the source id so the
    oracle can recompute it).  Per-source keep rate =
    min(1, N*w_i / (W*n_i)), applied as a deterministic md5-bucket coin:
    reproducible, shuffle-free, and re-runs / incremental batches agree
    doc-by-doc.

    One small aggregation to learn per-source counts (broadcast back),
    then a row-local keep decision — at 100 TB the only shuffle is the
    per-source count."""
    from ..functions.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    weight = 1 + F.regexp_extract("source", r"([0-9]+)$", 1).cast("long") % 3
    counts = (docs.groupBy("source")
              .agg(F.count("*").alias("n_docs"))
              .withColumn("weight", weight))
    tot = counts.agg(
        F.sum("n_docs").alias("n"),
        F.sum("weight").alias("w")).collect()[0]
    rates = counts.select(
        "source", "n_docs", "weight",
        F.least(
            F.lit(1000),
            F.expr(f"{int(tot['n'])} * weight * 1000"
                   f" div ({int(tot['w'])} * n_docs)"),
        ).alias("keep_permille"),
    )
    bucket = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit("#mix"))) % 1000
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "weight", "keep_permille")
        .agg(F.sum(F.when(bucket < F.col("keep_permille"), 1)
                   .otherwise(0)).alias("n_kept"))
        .orderBy("source")
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH hours AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
    ), ivl AS (
      SELECT h + INTERVAL 30 MINUTE AS w_start,
             h + INTERVAL 90 MINUTE AS w_end
      FROM hours
    ), spans AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             MIN(ts) AS s_start,
             MAX(ts) + INTERVAL 1 MINUTE AS s_end
      FROM events GROUP BY 1, 2
    )
    SELECT w_start, COUNT(*) AS n_spans, COUNT(DISTINCT user_id) AS n_users
    FROM ivl JOIN spans ON s_start < w_end AND w_start < s_end
    GROUP BY w_start
    ORDER BY w_start
    """,
    tags=("join", "interval", "overlap", "binning", "timeseries"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via binning (operators/overlap_join.py):
    per-hour maintenance windows x per-(user, day) activity spans, one
    row per overlapping pair, counted per window.

    The oracle is the naive theta join; the Spark plan is the binned
    EQUI join with the first-shared-bin filter standing in for DISTINCT
    — no nested-loop join, no dedup shuffle, bucketable by bin at
    100 TB."""
    from ..operators.overlap_join import interval_overlap_join

    events = load_table(spark, sf_dir, "events")
    ivl = (
        events.select(F.date_trunc("hour", "ts").alias("h")).distinct()
        .select(
            F.expr("h + INTERVAL 30 MINUTES").alias("w_start"),
            F.expr("h + INTERVAL 90 MINUTES").alias("w_end"),
        )
    )
    spans = (
        events.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(F.min("ts").alias("s_start"),
             F.expr("max(ts) + INTERVAL 1 MINUTE").alias("s_end"))
    )
    joined = interval_overlap_join(
        ivl, spans, "w_start", "w_end", "s_start", "s_end", bin_seconds=3600)
    return (
        joined.groupBy("w_start")
        .agg(F.count("*").alias("n_spans"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("w_start")
    )


@register(
    "feature_quantile_binning",
    # ntile over a UNIQUE total order (value, event_id) is pure integer
    # bucketing — both engines assign identical deciles; min/max are
    # cents-exact.
    oracle="""
    WITH binned AS (
      SELECT event_type, value,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT event_type, decile, COUNT(*) AS n,
           CAST(ROUND(MIN(value) * 100) AS BIGINT) AS lo_cents,
           CAST(ROUND(MAX(value) * 100) AS BIGINT) AS hi_cents
    FROM binned
    GROUP BY event_type, decile
    ORDER BY event_type, decile
    """,
    tags=("ml", "binning", "quantile", "window", "curation"),
)
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature discretization: decile-bin each event's
    value within its type (the quantile-binning preprocessing step of
    gradient-boosting / feature-store pipelines) and report per-bin
    count and [lo, hi] bounds.

    ntile over a unique total order is engine-exact integer bucketing —
    no interpolated percentiles anywhere.  One window shuffle on the
    partition key + the final small aggregate; at 100 TB the same two
    shuffles."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    binned = events.select(
        "event_type", "value", F.ntile(10).over(w).alias("decile"))
    return (
        binned.groupBy("event_type", "decile")
        .agg(F.count("*").alias("n"),
             F.round(F.min("value") * 100).cast("bigint").alias("lo_cents"),
             F.round(F.max("value") * 100).cast("bigint").alias("hi_cents"))
        .orderBy("event_type", "decile")
    )


@register(
    "sample_domain_cap",
    # Deterministic hash-rank capping: both engines rank by the same
    # md5(doc_id || '#cap') string and keep the first 40 per (lang,
    # source) cell, so the kept set -- not just its size -- is
    # engine-identical and fully hash-certified.
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#cap'), doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang, source,
           COUNT(*)                      AS n_kept,
           CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
           MIN(doc_id)                   AS min_doc,
           MAX(doc_id)                   AS max_doc
    FROM ranked WHERE rn <= 40
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    tags=("sample", "curation", "domain-cap", "llm"),
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain capping: keep at most N documents per (lang, source)
    cell, chosen by a DETERMINISTIC md5 rank — the curation step that
    stops any single domain from dominating a training mix, with a
    reproducible (and oracle-certifiable) kept set instead of an
    engine-RNG sample.  One shuffle on the cell key + a bounded
    window; at 100 TB the hash rank makes the sample stable across
    re-runs and engines, so downstream dedup/packing stages can cache
    against it.  (The seeded-RNG variants — sample_seeded /
    sample_stratified — remain the scan-time zero-shuffle path when
    reproducibility across ENGINES is not required.)"""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    rank_key = F.md5(F.concat(F.col("doc_id").cast("string"),
                              F.lit("#cap")))
    w = W.partitionBy("lang", "source").orderBy(rank_key, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_kept"),
             F.sum("n_chars").cast("bigint").alias("total_chars"),
             F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"))
        .orderBy("lang", "source")
    )
