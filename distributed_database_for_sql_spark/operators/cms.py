"""Count-min sketch as DataFrame aggregation: mergeable frequency
estimates with a portable hash.

The CMS (Cormode & Muthukrishnan 2005) is depth x width counter rows;
item estimate = min over rows of its bucket counter.  Built here as a
plain groupBy over (row j, bucket h_j(item)) pairs, which makes the
sketch:

- distributed: one shuffle of depth x width <= a few KB of counters,
  partial aggregation does the heavy lifting map-side;
- mergeable: sketches of two corpora ADD bucket-wise (counters are
  sums), the property that lets 100 TB shards sketch independently and
  union — exactly how heavy-hitter services run;
- deterministic and cross-engine reproducible: buckets come from the
  60-bit md5 prefix (functions/text.md5_long), so a SQL oracle can
  recompute the identical sketch — estimates here are exact integers,
  not an engine-private binary blob (unlike Spark's built-in
  count_min_sketch aggregate, whose sketch bytes only Spark can read).

The reference (a Go Raft core, SURVEY.md §2.A) has no sketch surface;
this extends §2.C's aggregate inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long


def _bucket(term_col: str, j_col, width: int):
    """Portable CMS bucket: md5_long(term || '#cms' || j) % width."""
    return md5_long(
        F.concat(F.col(term_col), F.lit("#cms"), j_col.cast("string"))
    ) % width


def cms_table(items: DataFrame, term_col: str, depth: int = 3,
              width: int = 64) -> DataFrame:
    """Build the depth x width counter table over an item stream.

    Returns (j, b, cnt) rows — at most depth*width of them regardless of
    input size.  Merging two corpora = unionAll + re-aggregate."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    return (
        items.select(F.col(term_col), j)
        .select("j", _bucket(term_col, F.col("j"), width).alias("b"))
        .groupBy("j", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(table: DataFrame, terms: DataFrame, term_col: str,
                 depth: int = 3, width: int = 64) -> DataFrame:
    """Estimate each distinct term's frequency: min over the depth rows
    of its bucket counter.  The counter table is tiny — broadcast."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    probes = (terms.select(F.col(term_col), j)
              .select(term_col, "j",
                      _bucket(term_col, F.col("j"), width).alias("b")))
    return (
        probes.join(F.broadcast(table), ["j", "b"])
        .groupBy(term_col)
        .agg(F.min("cnt").alias("cms_est"))
    )
