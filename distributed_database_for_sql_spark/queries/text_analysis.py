"""Text analysis for training-data pipelines: token statistics, quality
scoring, language-ID heuristics, word frequencies, fingerprints
(SURVEY.md §2.C "LLM ops" / north-star text analysis).

All row-level work is JVM expressions (split / filter / aggregate HOFs);
the only shuffles are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import STOPWORDS, md5_long, stopword_ratio, tokens
from .base import register


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                      AS n_tokens,
           len(list_distinct(string_split(text, ' ')))       AS n_unique,
           ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                 / len(string_split(text,' ')), 4)           AS ttr,
           ROUND(CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
                 / len(string_split(text,' ')), 4)           AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "llm"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts, type-token ratio, average token length.

    Token counting here is whitespace; the BPE-ish regex variant is
    text_token_count_bpe below."""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n_tok = F.size(tk)
    n_uniq = F.size(F.array_distinct(tk))
    return (
        docs.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            n_uniq.alias("n_unique"),
            F.round(n_uniq.cast("double") / n_tok, 4).alias("ttr"),
            F.round(
                (F.length("text") - n_tok + 1).cast("double") / n_tok, 4
            ).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+'))                       AS ws_tokens,
           len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
                           x -> x <> ''))                                 AS word_tokens,
           CAST(CEIL(length(text) / 4.0) AS BIGINT)                       AS approx_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokens", "llm"),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, word-regex, and the
    chars/4 BPE approximation used for LLM budget estimates."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), r"\s+")
    words = F.filter(
        F.split(F.col("text"), r"[^a-zA-Z0-9]+"), lambda x: x != ""
    )
    return (
        docs.select(
            "doc_id",
            F.size(ws).alias("ws_tokens"),
            F.size(words).alias("word_tokens"),
            F.ceil(F.length("text") / 4.0).alias("approx_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           ROUND(CAST(len(list_filter(string_split(text,' '),
                 t -> list_contains({list(STOPWORDS)!r}, lower(t)))) AS DOUBLE)
                 / len(string_split(text,' ')), 4) AS stop_ratio,
           ROUND(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text), 4) AS punct_ratio,
           ROUND(LEAST(length(text) / 500.0, 1.0) * 0.5
                 + CAST(len(list_filter(string_split(text,' '),
                       t -> list_contains({list(STOPWORDS)!r}, lower(t)))) AS DOUBLE)
                   / len(string_split(text,' ')) * 0.3
                 + (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                   / length(text)) * 0.2, 4) AS quality
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "quality", "llm"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + stopword ratio +
    punctuation penalty — the standard cheap pre-filter before expensive
    model-based scoring."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    stop_r = stopword_ratio(F.col("text"))
    punct_r = (
        F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", "")).cast("double")
        / n_chars
    )
    quality = (
        F.least(n_chars / 500.0, F.lit(1.0)) * 0.5
        + stop_r * 0.3
        + (1.0 - punct_r) * 0.2
    )
    return (
        docs.select(
            "doc_id",
            n_chars.alias("n_chars"),
            F.round(stop_r, 4).alias("stop_ratio"),
            F.round(punct_r, 4).alias("punct_ratio"),
            F.round(quality, 4).alias("quality"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_langid_heuristic",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text,' '),
                 t -> list_contains(['the','a','of','and','to'], t)))     AS en_score,
             len(list_filter(string_split(text,' '),
                 t -> list_contains(['data','table','row','column'], t))) AS tech_score
      FROM documents
    )
    SELECT doc_id, lang,
           en_score, tech_score,
           CASE WHEN en_score >= 3 THEN 'en-like' ELSE 'other' END AS predicted
    FROM scored
    ORDER BY doc_id
    """,
    tags=("text", "langid", "llm"),
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID: count hits against per-class marker sets,
    argmax → label.  (The fixture corpus shares one vocabulary across its
    lang tags, so this checks the mechanism, not real-world accuracy.)"""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    en_markers = ["the", "a", "of", "and", "to"]
    tech_markers = ["data", "table", "row", "column"]
    en_score = F.size(F.filter(tk, lambda t: t.isin(*en_markers)))
    tech_score = F.size(F.filter(tk, lambda t: t.isin(*tech_markers)))
    return (
        docs.select(
            "doc_id", "lang",
            en_score.alias("en_score"),
            tech_score.alias("tech_score"),
            F.when(en_score >= 3, "en-like").otherwise("other").alias("predicted"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_word_freq_topk",
    oracle="""
    SELECT token, n, rn
    FROM (
      SELECT token, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rn
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
    ) t
    WHERE rn <= 20
    ORDER BY rn
    """,
    tags=("text", "freq", "llm"),
)
def text_word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term frequency, top-20 (explode → count → rank).

    The explode shuffles |tokens| rows once; at 100 TB you'd pre-aggregate
    per partition (map-side combine already does) — the plan is exactly
    that shape."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # Top-k FIRST via orderBy+limit (TakeOrderedAndProject: each partition
    # keeps its local top 20, the driver merges) — a global row_number
    # window here would instead sort the whole vocabulary on ONE
    # partition.  The rank window then sees only the 20 survivors.
    w = W.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.orderBy(F.desc("n"), F.asc("token")).limit(20)
        .withColumn("rn", F.row_number().over(w))
        .orderBy("rn")
    )


@register(
    "text_bigram_topk_per_lang",
    oracle="""
    SELECT lang, bigram, n, rn
    FROM (
      SELECT lang, bigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, bigram ASC) AS rn
      FROM (
        SELECT lang, unnest([array_to_string(string_split(text,' ')[i:i+1],' ')
                             FOR i IN generate_series(1, len(string_split(text,' '))-1)]) AS bigram
        FROM documents
      )
      GROUP BY lang, bigram
    ) t
    WHERE rn <= 5
    ORDER BY lang, rn
    """,
    tags=("text", "ngram", "llm"),
)
def text_bigram_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language (n-gram model input)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.array_join(F.slice(tk, i, 2), " "),
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("lang", "rn")
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS bag_fp,
           ('0x'||substr(md5(text),1,15))::BIGINT AS content_fp
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "fingerprint", "llm"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: order-insensitive bag fingerprint (md5 of
    sorted distinct tokens) + 60-bit content hash — the join keys for
    cheap exact/near-exact dedup at scale."""
    docs = load_table(spark, sf_dir, "documents")
    bag = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " ")
    )
    return (
        docs.select(
            "doc_id",
            bag.alias("bag_fp"),
            md5_long(F.col("text")).alias("content_fp"),
        )
        .orderBy("doc_id")
    )


@register(
    "profile_corpus_stats",
    oracle="""
    SELECT COUNT(*)                                   AS n_rows,
           COUNT(DISTINCT lang)                       AS n_langs,
           COUNT(DISTINCT source)                     AS n_sources,
           CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
           MIN(n_chars)                               AS min_chars,
           MAX(n_chars)                               AS max_chars,
           ROUND(AVG(n_chars), 4)                     AS avg_chars,
           CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_len_mismatch
    FROM documents
    """,
    tags=("profile", "quality", "llm"),
)
def profile_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: the data-quality report a training pipeline runs
    before anything else — row/empty counts, dimension cardinalities,
    length range, and a metadata-consistency check (n_chars vs length).

    One global aggregate pass: all measures partial-aggregate map-side,
    so the shuffle is a handful of rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    empty = F.col("text").isNull() | (F.col("text") == "")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(empty, 1).otherwise(0)).alias("n_empty"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0))
        .alias("n_len_mismatch"),
    )


@register(
    "text_langid_ngram_profile",
    oracle="""
    WITH tg AS (
      SELECT doc_id, lang,
             list_distinct([substring(text, i, 3)
                            FOR i IN generate_series(1, length(text)-2)]) AS g
      FROM documents
    ), exploded AS (
      SELECT doc_id, lang, unnest(g) AS gram FROM tg
    ), grams AS (
      SELECT lang, gram, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, gram ASC) AS rn
      FROM exploded GROUP BY lang, gram
    ), profile AS (SELECT lang AS cand, gram FROM grams WHERE rn <= 20),
    scores AS (
      SELECT e.doc_id, e.lang AS true_lang, p.cand, COUNT(*) AS overlap
      FROM exploded e JOIN profile p ON e.gram = p.gram
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT doc_id, true_lang, cand, overlap,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY overlap DESC, cand ASC) AS rn
      FROM scores
    )
    SELECT doc_id, true_lang, cand AS predicted, overlap
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    tags=("text", "langid", "ngram", "llm"),
)
def text_langid_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram-profile language ID (the classic n-gram
    heuristic): learn each lang's top-20 trigrams from the corpus, score
    every document by profile overlap, predict the argmax with
    deterministic ties.

    Shapes, at scale: profile building is one explode + count shuffle
    with a per-lang top-k window (|langs| partitions); scoring is an
    EQUI join of exploded doc grams against the (tiny, broadcast)
    profile — never a contains() theta join.  (The fixture corpus shares
    one vocabulary across lang tags, so accuracy here checks the
    mechanism, not real-world discrimination — same caveat as
    text_langid_heuristic.)"""
    from ..functions.text import char_ngrams

    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.col("lang").alias("true_lang"),
        F.explode(char_ngrams(F.col("text"), n=3)).alias("gram"),
    )
    wp = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    profile = (
        exploded.groupBy(F.col("true_lang").alias("lang"), "gram")
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= 20)
        .select(F.col("lang").alias("cand"), "gram")
    )
    wd = W.partitionBy("doc_id").orderBy(F.desc("overlap"), F.asc("cand"))
    return (
        exploded.join(F.broadcast(profile), "gram")
        .groupBy("doc_id", "true_lang", "cand")
        .agg(F.count("*").alias("overlap"))
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("cand").alias("predicted"), "overlap")
        .orderBy("doc_id")
    )


@register(
    "quality_gopher_rules",
    # All ratio columns are exact integers (x*1000 integer-divided by the
    # word count) so the cross-engine hash never touches a double.
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' '))                    AS n_words,
             length(text) - len(string_split(text, ' ')) + 1 AS letters,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to','in','is',
                                     'on','for','with'], lower(t))))
               AS n_stop,
             len(list_distinct(string_split(text, ' ')))     AS n_distinct
      FROM documents
    )
    SELECT doc_id, n_words,
           CAST(letters * 1000 // n_words AS BIGINT)    AS mean_wlen_milli,
           CAST(n_stop * 1000 // n_words AS BIGINT)     AS stop_milli,
           CAST(n_distinct * 1000 // n_words AS BIGINT) AS distinct_milli,
           (n_words BETWEEN 5 AND 5000
            AND letters * 1000 // n_words BETWEEN 2000 AND 12000
            AND n_stop * 1000 // n_words >= 20
            AND n_distinct * 1000 // n_words >= 200)    AS passes
    FROM s
    ORDER BY doc_id
    """,
    tags=("quality", "filter", "text", "llm"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 family):
    word-count bounds, mean-word-length bounds, minimum stop-word
    fraction, minimum distinct-word ratio — the standard first-pass
    heuristics a pretraining pipeline applies before any model-based
    scoring.

    Pure row-local JVM expressions (split / filter / distinct HOFs), no
    shuffle — a linear scan at any scale.  Every ratio is quantized via
    integer division (x*1000 div n) so both engines compare exact
    integers; the composite `passes` boolean is the filter verdict."""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n_words = F.size(tk).cast("long")
    letters = (F.length("text") - F.size(tk) + 1).cast("long")
    n_stop = F.size(
        F.filter(tk, lambda t: F.lower(t).isin(*STOPWORDS))).cast("long")
    n_distinct = F.size(F.array_distinct(tk)).cast("long")
    return (
        docs.select(
            "doc_id",
            n_words.alias("n_words"),
            (letters * 1000).alias("__lm"),
            (n_stop * 1000).alias("__sm"),
            (n_distinct * 1000).alias("__dm"),
        )
        .select(
            "doc_id", "n_words",
            F.expr("__lm div n_words").alias("mean_wlen_milli"),
            F.expr("__sm div n_words").alias("stop_milli"),
            F.expr("__dm div n_words").alias("distinct_milli"),
        )
        .withColumn(
            "passes",
            F.col("n_words").between(5, 5000)
            & F.col("mean_wlen_milli").between(2000, 12000)
            & (F.col("stop_milli") >= 20)
            & (F.col("distinct_milli") >= 200),
        )
        .orderBy("doc_id")
    )


@register(
    "sketch_cms_heavy_hitters",
    # The md5-bucketed CMS is cross-engine exact (operators/cms.py), so
    # unlike engine-private sketch binaries this one is fully oracled:
    # DuckDB rebuilds the identical counter table and takes the same
    # minima.  All columns are integers.
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ), js AS (
      SELECT unnest([0, 1, 2]) AS j
    ), buckets AS (
      SELECT j,
             ('0x' || substr(md5(term || '#cms' || j), 1, 15))::BIGINT % 64
               AS b,
             COUNT(*) AS cnt
      FROM tok, js GROUP BY j, b
    ), exact AS (
      SELECT term, COUNT(*) AS exact_cnt FROM tok GROUP BY term
    ), est AS (
      SELECT e.term, e.exact_cnt, MIN(bu.cnt) AS cms_est
      FROM exact e
      JOIN js ON TRUE
      JOIN buckets bu
        ON bu.j = js.j
       AND bu.b = ('0x' || substr(md5(e.term || '#cms' || js.j), 1, 15))
                    ::BIGINT % 64
      GROUP BY e.term, e.exact_cnt
    )
    SELECT term, exact_cnt, cms_est, cms_est - exact_cnt AS overestimate
    FROM est
    ORDER BY exact_cnt DESC, term
    LIMIT 20
    """,
    tags=("sketch", "cms", "aggregate", "text", "llm"),
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch (operators/cms.py): the
    top-20 corpus terms with their exact counts, CMS estimates (depth 3,
    width 64), and the sketch's one-sided overestimate — visible proof
    the estimate bounds hold (cms_est >= exact always).

    The sketch is a depth*width counter table built map-side and merged
    bucket-wise — the mergeable-shard shape heavy-hitter services use at
    100 TB; the probe side joins the broadcast counter table."""
    from ..operators.cms import cms_estimate, cms_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    tok = tok.persist()
    table = cms_table(tok, "term", depth=3, width=64)
    exact = tok.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    est = cms_estimate(table, exact.select("term"), "term",
                       depth=3, width=64)
    return (
        exact.join(est, "term")
        .select("term", "exact_cnt", "cms_est",
                (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"))
        .orderBy(F.desc("exact_cnt"), "term")
        .limit(20)
    )


@register(
    "quality_lm_perplexity",
    # Per-doc token-logprob sums aggregate in nondeterministic order, so
    # the score is floor-quantized at 1e-3 (jitter ~1e-14 relative);
    # counts and the verdict threshold compare quantized integers.
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), lm AS (
      SELECT term, COUNT(*) AS tf FROM tok GROUP BY term
    ), tot AS (
      SELECT SUM(tf) AS n FROM lm
    ), scored AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens,
             SUM(LN(lm.tf / (SELECT n FROM tot))) AS logprob_sum
      FROM tok t JOIN lm ON t.term = lm.term
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR(logprob_sum / n_tokens * 1000 + 0.5) AS BIGINT)
             AS avg_logprob_milli,
           CAST(FLOOR(logprob_sum / n_tokens * 1000 + 0.5) AS BIGINT)
             >= -6000 AS keeps
    FROM scored
    ORDER BY doc_id
    """,
    tags=("quality", "perplexity", "lm", "text", "llm"),
)
def quality_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style LM quality filter (the CCNet/Gopher shape, with
    a corpus-fit unigram LM standing in for the KenLM model): every
    token's logprob comes from the corpus unigram distribution, each
    doc is scored by mean token logprob, and docs below the threshold
    (here -6 nats — word salad scores low) would be dropped.

    Two shuffles: the unigram fit (term counts — broadcast back as the
    "model"), then the per-doc score aggregate.  At 100 TB the LM is a
    stored artifact and scoring is one broadcast join + aggregate —
    exactly this plan minus the fit."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tok = tok.persist()
    lm = tok.groupBy("term").agg(F.count("*").alias("tf"))
    n_total = int(lm.agg(F.sum("tf").alias("n")).collect()[0]["n"])
    scored = (
        tok.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.sum(F.log(F.col("tf") / F.lit(float(n_total))))
              .alias("logprob_sum"))
    )
    avg_milli = F.floor(
        F.col("logprob_sum") / F.col("n_tokens") * 1000 + F.lit(0.5)
    ).cast("bigint")
    return (
        scored.select(
            "doc_id", "n_tokens",
            avg_milli.alias("avg_logprob_milli"),
            (avg_milli >= -6000).alias("keeps"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_chunk_overlap",
    # CHUNK=64 tokens, STRIDE=48 (16-token overlap): starts at
    # 1, 49, 97, ... while start <= max(1, n_tokens - overlap), so every
    # token is covered, consecutive chunks share 16 tokens, and a
    # sub-overlap doc yields exactly one chunk.
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), s AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, greatest(1, len(tk) - 16), 48)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS BIGINT)        AS chunk_index,
           CAST(start AS BIGINT)                    AS chunk_start,
           CAST(len(list_slice(tk, start, start + 63)) AS INT)
                                                    AS chunk_n_tokens,
           CAST(length(array_to_string(list_slice(tk, start, start + 63), ' '))
                AS INT)                             AS chunk_n_chars,
           substring(md5(array_to_string(list_slice(tk, start, start + 63), ' ')),
                     1, 8)                          AS chunk_md5_8
    FROM s
    ORDER BY doc_id, chunk_index
    """,
    tags=("text", "llm", "rag", "chunking"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking: split each document's token
    sequence into 64-token windows with a 48-token stride (16 shared
    tokens between neighbors), the preprocessing step for embedding /
    retrieval indexes.  Pure JVM expressions — sequence + explode +
    slice — so chunking a 100 TB corpus is a row-local projection with
    zero shuffles; the md5 prefix certifies the chunk CONTENT (not just
    counts) against the oracle."""
    CHUNK, STRIDE, OVERLAP = 64, 48, 16
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    df = (docs.select("doc_id", tk.alias("tk"))
          .withColumn("start", F.explode(F.sequence(
              F.lit(1),
              F.greatest(F.lit(1), F.size("tk") - F.lit(OVERLAP)),
              F.lit(STRIDE)))))
    chunk = F.slice(F.col("tk"), F.col("start"), CHUNK)
    chunk_text = F.array_join(chunk, " ")
    return (df.select(
        "doc_id",
        ((F.col("start") - 1) / F.lit(STRIDE)).cast("long")
        .alias("chunk_index"),
        F.col("start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("int").alias("chunk_n_tokens"),
        F.length(chunk_text).cast("int").alias("chunk_n_chars"),
        F.substring(F.md5(chunk_text), 1, 8).alias("chunk_md5_8"))
        .orderBy("doc_id", "chunk_index"))


# US (unit separator) joins merged BPE tokens — cannot appear in the
# space-tokenized corpus, and is mapped to '+' in emitted pairs.
_BPE_US = "\x1f"


def _bpe_rounds(df: DataFrame, rounds: int = 3):
    """The shared greedy BPE loop: ``df`` must carry (doc_id, s) with s
    space-padded.  Each round = one distributed adjacent-pair count
    (map-side combinable) + a 1-row argmax collect (model state) + a
    row-local plain-replace merge.  Returns (merges, encoded df) —
    training reads the merges, encoding reads the df."""
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, rounds + 1):
        tk = F.split(F.trim(F.col("s")), " ")
        pair_arr = F.when(
            F.size(tk) >= 2,
            F.expr("transform(sequence(1, size(split(trim(s), ' ')) - 1), "
                   "i -> concat(element_at(split(trim(s), ' '), i), ' ', "
                   "element_at(split(trim(s), ' '), i + 1)))")
        ).otherwise(F.array().cast("array<string>"))
        top = (df.select(F.explode(pair_arr).alias("pair"))
               .groupBy("pair").agg(F.count("*").alias("c"))
               .orderBy(F.desc("c"), F.asc("pair"))
               .limit(1).collect()[0])
        merges.append((rank, top["pair"], top["c"]))
        merged = top["pair"].replace(" ", _BPE_US)
        df = df.withColumn(
            "s", F.replace(F.col("s"),
                           F.lit(f" {top['pair']} "),
                           F.lit(f" {merged} ")))
    return merges, df


@register(
    "tokenizer_bpe_train_merges",
    # Both engines implement the IDENTICAL greedy merge step: count
    # adjacent token pairs, pick (count DESC, pair ASC), then apply the
    # merge as a plain leftmost-non-overlapping substring replace of
    # ' a b ' with ' a<US>b ' on space-padded text.  Plain replace (not
    # regex) has the same semantics in Spark and DuckDB, so the learned
    # merge tables are bit-equal.
    oracle=f"""
    WITH t0 AS (SELECT doc_id, ' ' || text || ' ' AS s FROM documents),
    p1 AS (
      SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
      FROM (SELECT string_split(trim(s), ' ') AS tk FROM t0),
           UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    b1 AS (SELECT pair, COUNT(*) AS c FROM p1 GROUP BY pair
           ORDER BY c DESC, pair LIMIT 1),
    t1 AS (
      SELECT doc_id,
             replace(s, ' ' || (SELECT pair FROM b1) || ' ',
                     ' ' || replace((SELECT pair FROM b1), ' ', '\x1f')
                     || ' ') AS s
      FROM t0
    ),
    p2 AS (
      SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
      FROM (SELECT string_split(trim(s), ' ') AS tk FROM t1),
           UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    b2 AS (SELECT pair, COUNT(*) AS c FROM p2 GROUP BY pair
           ORDER BY c DESC, pair LIMIT 1),
    t2 AS (
      SELECT doc_id,
             replace(s, ' ' || (SELECT pair FROM b2) || ' ',
                     ' ' || replace((SELECT pair FROM b2), ' ', '\x1f')
                     || ' ') AS s
      FROM t1
    ),
    p3 AS (
      SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
      FROM (SELECT string_split(trim(s), ' ') AS tk FROM t2),
           UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    b3 AS (SELECT pair, COUNT(*) AS c FROM p3 GROUP BY pair
           ORDER BY c DESC, pair LIMIT 1)
    SELECT merge_rank, replace(pair, '\x1f', '+') AS merge_pair,
           CAST(c AS BIGINT) AS pair_count
    FROM (
      SELECT 1 AS merge_rank, pair, c FROM b1
      UNION ALL SELECT 2, pair, c FROM b2
      UNION ALL SELECT 3, pair, c FROM b3
    ) ORDER BY merge_rank
    """,
    tags=("text", "llm", "tokenizer", "bpe", "iterative"),
)
def tokenizer_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style tokenizer merge TRAINING, distributed: three greedy
    merge rounds, each = one distributed adjacent-pair count over the
    whole corpus + a 1-row argmax collect (the learned merge — model
    state, like a k-means centroid) + a row-local merge application.
    At 100 TB each round is a single map-side-combinable count shuffle;
    the corpus never leaves the executors and driver state is one pair
    per round — the exact shape of corpus-scale tokenizer training.
    The oracle replays the identical algorithm in SQL, so the learned
    merge table is certified bit-equal, not just plausible."""
    docs = load_table(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id",
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("s"))
    merges, _ = _bpe_rounds(df, rounds=3)
    out = spark.createDataFrame(
        [(r, p.replace(_BPE_US, "+"), int(c)) for r, p, c in merges],
        "merge_rank int, merge_pair string, pair_count bigint")
    return out.orderBy("merge_rank")


@register(
    "tokenizer_bpe_encode",
    # The oracle replays training (t0->t3 chain, identical to the
    # tokenizer_bpe_train_merges oracle) and then AGGREGATES the encoded
    # corpus — so the hash certifies the distributed ENCODING itself,
    # per language: token counts before/after and how many emitted
    # tokens are merge products.  DuckDB's merge separator is the
    # literal 4-char '\x1f' while Spark uses the real US control char —
    # both are space-free and absent from the corpus, so token
    # structure (and every count) is engine-identical.
    oracle="""
    WITH t0 AS (SELECT doc_id, ' ' || text || ' ' AS s FROM documents
                WHERE text IS NOT NULL AND text <> ''),
    p1 AS (
      SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
      FROM (SELECT string_split(trim(s), ' ') AS tk FROM t0),
           UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    b1 AS (SELECT pair, COUNT(*) AS c FROM p1 GROUP BY pair
           ORDER BY c DESC, pair LIMIT 1),
    t1 AS (
      SELECT doc_id,
             replace(s, ' ' || (SELECT pair FROM b1) || ' ',
                     ' ' || replace((SELECT pair FROM b1), ' ', '\x1f')
                     || ' ') AS s
      FROM t0
    ),
    p2 AS (
      SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
      FROM (SELECT string_split(trim(s), ' ') AS tk FROM t1),
           UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    b2 AS (SELECT pair, COUNT(*) AS c FROM p2 GROUP BY pair
           ORDER BY c DESC, pair LIMIT 1),
    t2 AS (
      SELECT doc_id,
             replace(s, ' ' || (SELECT pair FROM b2) || ' ',
                     ' ' || replace((SELECT pair FROM b2), ' ', '\x1f')
                     || ' ') AS s
      FROM t1
    ),
    p3 AS (
      SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
      FROM (SELECT string_split(trim(s), ' ') AS tk FROM t2),
           UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    b3 AS (SELECT pair, COUNT(*) AS c FROM p3 GROUP BY pair
           ORDER BY c DESC, pair LIMIT 1),
    t3 AS (
      SELECT doc_id,
             replace(s, ' ' || (SELECT pair FROM b3) || ' ',
                     ' ' || replace((SELECT pair FROM b3), ' ', '\x1f')
                     || ' ') AS s
      FROM t2
    ),
    enc AS (SELECT doc_id, string_split(trim(s), ' ') AS tk FROM t3)
    SELECT d.lang,
           COUNT(*)                                   AS n_docs,
           CAST(SUM(len(string_split(trim(d.text), ' '))) AS BIGINT)
                                                      AS tokens_before,
           CAST(SUM(len(e.tk)) AS BIGINT)             AS tokens_after,
           CAST(SUM(len(list_filter(e.tk,
                        x -> contains(x, '\x1f')))) AS BIGINT)
                                                      AS merged_tokens
    FROM enc e JOIN documents d USING (doc_id)
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    tags=("text", "llm", "tokenizer", "bpe", "encode"),
)
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer ENCODING, distributed — the apply half of the
    train→apply pair (tokenizer_bpe_train_merges learns the table, this
    applies it corpus-wide): after the three greedy merge rounds, every
    document is re-tokenized with merged tokens, entirely row-local
    (plain leftmost replace — no shuffle beyond training's pair
    counts), and the per-language encoding stats are hash-certified
    against the oracle's full SQL replay.  At 100 TB the merge table is
    model state (bytes, broadcast in the replace literals) and encoding
    is a pure map — the exact production shape of corpus tokenization,
    where compression (tokens_after < tokens_before as merges fire) is
    the metric being bought."""
    docs = load_table(spark, sf_dir, "documents")
    nonempty = docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
    df = nonempty.select(
        "doc_id",
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("s"))
    _, encoded = _bpe_rounds(df, rounds=3)
    tk = F.split(F.trim(F.col("s")), " ")
    merged_ct = F.size(F.filter(tk, lambda x: x.contains(_BPE_US)))
    per_doc = encoded.select(
        "doc_id",
        F.size(tk).alias("n_after"),
        merged_ct.alias("n_merged"))
    before = nonempty.select(
        "doc_id", "lang",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_before"))
    return (
        before.join(per_doc, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_before").cast("bigint").alias("tokens_before"),
             F.sum("n_after").cast("bigint").alias("tokens_after"),
             F.sum("n_merged").cast("bigint").alias("merged_tokens"))
        .orderBy("lang")
    )
