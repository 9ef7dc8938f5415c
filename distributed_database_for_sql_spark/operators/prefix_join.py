"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin family).

Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search" (WWW'07);
Xiao et al., "Efficient Similarity Joins for Near Duplicate Detection"
(WWW'08).  The lossless pruning lemma: impose ONE global order on tokens
(rarest first — ascending document frequency, ties by token).  For sets
A, B with Jaccard(A,B) ≥ t, let z be the globally-smallest token of A∩B.
Every token of A ordered before z is outside B, so
|A∩B| ≤ |A| − (pos_A(z) − 1); since J ≥ t forces |A∩B| ≥ ⌈t·|A|⌉, z must
sit within A's first |A| − ⌈t·|A|⌉ + 1 tokens — its *prefix* — and
symmetrically within B's.  Joining prefixes on the token is therefore a
COMPLETE candidate generator: no true pair can be missed, ever — unlike
LSH there is no probabilistic recall knob.

Why it beats LSH when the similarity distribution is flat: banded MinHash
prunes by overall similarity, so a corpus where most pairs sit just under
the threshold (small alphabets, templated text) makes nearly every pair a
candidate (measured: 11.7M candidates from 5k docs of char-4-grams).
Prefix filtering prunes by *rare-token co-occurrence*: candidates are
pairs sharing a rare token, and rarity is exactly what common boilerplate
grams don't have.

Plan shape (all DataFrame ops):
  explode(id, token) → token df (groupBy count) → per-doc global-order
  rank (one window) → keep rank ≤ prefix length → self-join prefixes on
  token → distinct pairs → exact Jaccard verify on the full sets →
  filter ≥ t.  Shuffles: df agg, the rank window, the prefix equi-join,
  and the verify joins — each keyed, none quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import jaccard


def similarity_join_prefix(
    sets: DataFrame,
    id_col: str = "id",
    set_col: str = "tokens",
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs (id_a < id_b, jacc) with exact Jaccard ≥ threshold.

    `sets[set_col]` must be a distinct-element array column.
    """
    base = sets.select(F.col(id_col).alias("id"), F.col(set_col).alias("tk"),
                       F.size(set_col).alias("n"))

    tok = base.select("id", "n", F.explode("tk").alias("t"))
    df_counts = tok.groupBy("t").agg(F.count("*").alias("df"))

    # Global rarest-first rank inside each doc; prefix keeps the tokens a
    # qualifying partner is FORCED to share.
    w = Window.partitionBy("id").orderBy("df", "t")
    prefix_len = (F.col("n") - F.ceil(threshold * F.col("n")) + 1).cast("int")
    prefixes = (
        tok.join(df_counts, "t")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= prefix_len)
        .select("id", "t")
    )

    candidates = (
        prefixes.alias("a")
        .join(prefixes.alias("b"),
              (F.col("a.t") == F.col("b.t")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sa = base.select(F.col("id").alias("id_a"), F.col("tk").alias("tk_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("tk").alias("tk_b"))
    return (
        candidates.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jacc", jaccard(F.col("tk_a"), F.col("tk_b")))
        .filter(F.col("jacc") >= threshold)
        .select("id_a", "id_b", "jacc")
    )
