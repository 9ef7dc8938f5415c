"""Text-processing expressions: tokenization, shingles, cross-engine hashing,
language/quality heuristics, fingerprints.

Used by the dedup / text-analysis pipelines (SURVEY.md §2.C "LLM ops").
All expressions are JVM built-ins.

The portable hash `md5_long` (first 15 hex chars of md5 → 60-bit int) is
deliberately chosen over `xxhash64` because DuckDB computes the identical
value (`('0x' || substr(md5(s), 1, 15))::BIGINT`), which makes MinHash
signatures and LSH pipelines oracle-checkable bit-for-bit.  At 100 TB you'd
swap in `F.xxhash64` (≈10× cheaper, same distribution properties) — the
pipeline shape is unchanged; only this leaf expression differs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB twin: ('0x' || substr(md5(s), 1, 15))::BIGINT
MD5_LONG_SQL = "CAST(CONV(SUBSTRING(MD5({0}), 1, 15), 16, 10) AS BIGINT)"


def md5_long(c: Column) -> Column:
    """Deterministic 60-bit integer hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is space-tokenized by design)."""
    return F.split(text, " ")


def word_shingles(text: Column, w: int = 3) -> Column:
    """Distinct w-word shingles: the MinHash unit.

    Word shingles discriminate near-duplicates where raw-token Jaccard
    can't (small vocabularies make token sets collide).  Docs shorter than
    w words fall back to the whole text as a single shingle.
    """
    tk = tokens(text)
    n = F.size(tk)
    sh = F.transform(
        F.sequence(F.lit(1), n - (w - 1)),
        lambda i: F.array_join(F.slice(tk, i, w), " "),
    )
    return F.array_distinct(F.when(n >= w, sh).otherwise(F.array(text)))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (SimHash / fuzzy-match unit)."""
    ln = F.length(text)
    grams = F.transform(
        F.sequence(F.lit(1), ln - (n - 1)),
        lambda i: text.substr(i, F.lit(n)),
    )
    return F.array_distinct(F.when(ln >= n, grams).otherwise(F.array(text)))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: sig[i] = min over shingles of h_i(shingle).

    h_i(s) = md5_long(s || '#' || i) — seed-varied portable hash.  All
    num_hashes minima are computed in one pass over the shingle array via
    nested higher-order functions (no explode, no shuffle).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: md5_long(F.concat(s, F.lit("#"), i.cast("string"))),
            )
        ),
    )


def simhash(units: Column, bits: int = 16) -> Column:
    """SimHash over a unit array: bit b set iff Σ_units (2·bit_b(h(u))−1) > 0.

    md5 runs ONCE per unit (the hash array materializes first), then the
    per-bit ±1 sums fold over cheap integer ops — the earlier per-bit
    fold recomputed md5 `bits`× per unit and was the whole cost of the
    SimHash queries (measured 16× redundant hashing at bench SF).
    Supports widths up to md5_long's 60-bit base hash."""
    hashes = F.transform(units, md5_long)
    zeros = F.expr(f"array_repeat(CAST(0 AS LONG), {bits})")

    def bit_pm1(h):  # ±1 per bit of one hash, unrolled (bit index is static)
        return F.array(*[
            F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            for b in range(bits)
        ])
    sums = F.aggregate(
        hashes, zeros,
        lambda acc, h: F.zip_with(acc, bit_pm1(h), lambda a, s: a + s),
    )
    # `sums` must appear exactly ONCE in the returned expression —
    # interpreted HOFs have no common-subexpression elimination, so each
    # further reference would re-run the whole fold.
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    contrib = F.zip_with(
        sums, weights,
        lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("long")))
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (f64)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def stopword_ratio(text: Column) -> Column:
    tk = tokens(text)
    n_stop = F.size(F.filter(tk, lambda t: F.lower(t).isin(*STOPWORDS)))
    return n_stop.cast("double") / F.size(tk)
