"""End-to-end training-data curation pipeline — the capstone composition.

One query chaining the stages a real LLM-corpus build runs, each stage an
operator already verified in isolation elsewhere in the registry:

    quality gate  (heuristic score ≥ 0.45; text_quality_score)
  → exact dedup   (keep lowest doc_id per md5; dedup_exact_survivors)
  → near-dup dedup(MinHash-LSH pairs at J ≥ 0.5 → connected components →
                   keep each cluster's minimum id; dedup_connected_components)
  → corpus stats  (per-lang doc count, token sum, mean quality)

The DuckDB oracle recomputes the WHOLE chain — including the transitive
closure of near-dup clusters via a recursive CTE — so a hash match proves
the composition, not just the stages.

Scale shape: the gates are narrowing — each stage feeds the next a
strict subset, so the expensive near-dup stage sees only quality-passing,
exact-deduped survivors.  Every stage is the scale-ready form (hashed
dedup, LSH-pruned pairs, distributed label propagation); the final stats
aggregate is a low-cardinality groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import STOPWORDS, stopword_ratio
from ..operators.components import connected_components
from ..operators.minhash import minhash_lsh_pairs
from .base import register

_QUALITY_GATE = 0.45

_STOP_SQL = f"{list(STOPWORDS)!r}"

_ORACLE = f"""
    WITH RECURSIVE q AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             LEAST(length(text) / 500.0, 1.0) * 0.5
             + CAST(len(list_filter(string_split(text,' '),
                   t -> list_contains({_STOP_SQL}, lower(t)))) AS DOUBLE)
               / len(string_split(text,' ')) * 0.3
             + (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text)) * 0.2 AS quality
      FROM documents
    ), gated AS (
      SELECT * FROM q WHERE quality >= {_QUALITY_GATE}
    ), exact AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3
                  THEN list_distinct([array_to_string(string_split(text,' ')[i:i+2],' ')
                        FOR i IN generate_series(1, len(string_split(text,' '))-2)])
                  ELSE [text] END AS s
      FROM exact
    ), pairs AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE) /
            (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
    ), clusters AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), survivors AS (
      SELECT ex.* FROM exact ex
      LEFT JOIN clusters c ON ex.doc_id = c.node
      WHERE c.node IS NULL OR c.component = ex.doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(quality), 4) AS avg_quality
    FROM survivors
    GROUP BY lang
    ORDER BY lang
"""


@register(
    "pipeline_training_data_curation",
    oracle=_ORACLE,
    tags=("pipeline", "dedup", "quality", "components", "llm", "flagship"),
)
def pipeline_training_data_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → near-dup cluster dedup → per-lang stats,
    as one composed DataFrame plan (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    punct_r = (F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
               .cast("double") / n_chars)
    quality = (F.least(n_chars / 500.0, F.lit(1.0)) * 0.5
               + stopword_ratio(F.col("text")) * 0.3
               + (1.0 - punct_r) * 0.2)

    gated = docs.select(
        "doc_id", "lang", "text",
        F.size(F.split("text", " ")).alias("n_tokens"),
        quality.alias("quality"),
    ).filter(F.col("quality") >= _QUALITY_GATE)

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (gated.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).drop("rn").persist())

    pairs = minhash_lsh_pairs(exact, threshold=0.5, num_hashes=128, bands=64)
    clusters = connected_components(pairs)

    survivors = (
        exact.join(clusters, exact.doc_id == clusters.node, "left_outer")
        .filter(F.col("node").isNull() | (F.col("component") == F.col("doc_id")))
    )
    return (
        survivors.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.round(F.avg("quality"), 4).alias("avg_quality"))
        .orderBy("lang")
    )
