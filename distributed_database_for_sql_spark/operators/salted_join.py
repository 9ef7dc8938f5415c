"""Salted equi-join: the manual skew-mitigation pattern.

When one join key dominates (a celebrity user, an empty-string bucket, a
default enum), every row with that key lands in one shuffle partition and
one task runs for hours while the rest idle.  AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin`) handles sort-merge cases at runtime; the
salted join is the explicit form — needed when AQE can't see the skew
(aggregations feeding joins, non-SMJ plans) or when the engine must
guarantee the fan-out statically.

Mechanics: the large (skewed) side gets a salt in [0, n) derived from a
per-row hash — same-key rows scatter across n sub-keys; the small side is
replicated n× (explode over the salt range).  Joining on (key, salt) is
semantically identical to joining on key, but the hot key's rows now
spread over n partitions.  Cost: small side shuffles n× its size — choose
n ≈ (hot-key rows / target partition rows).

The reference has no joins at all (SURVEY.md §2.D); this is 100 TB
engineering for the engine's own surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

# Joins whose result is invariant to the salt.  Each `large` row carries
# exactly one salt value and the `small` side is replicated across every
# salt, so any (key, salt) probe sees exactly the small rows for that key:
# inner/left/semi/anti all match per-large-row semantics of the unsalted
# join.  Right/full/right_semi flip the probe direction — the replicated
# small rows surface n× as (possibly unmatched) outputs — so they are
# rejected rather than silently wrong (round-1 advice).
_SALT_SAFE_HOW = {
    "inner", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    large_salt_expr: Column | None = None,
) -> DataFrame:
    """Join `large` ⋈ `small` on equi-key(s) with an n-way salt fan-out.

    `large_salt_expr` lets callers salt deterministically from a unique
    column set; the default hashes the whole row (xxhash64 over all
    columns), which distributes same-key rows uniformly without needing a
    unique id.  Only the join *distribution* depends on the salt — the
    join *result* never does.
    """
    if how.lower().replace(" ", "") not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-invariant (the "
            f"replicated small side would yield duplicated or missing "
            f"unmatched rows); use one of {sorted(_SALT_SAFE_HOW)} or an "
            f"unsalted join")
    keys = [on] if isinstance(on, str) else list(on)
    if large_salt_expr is None:
        large_salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]),
                                 F.lit(salt))
    salted_large = large.withColumn(SALT_COL, large_salt_expr.cast("int"))
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return (
        salted_large.join(replicated_small, keys + [SALT_COL], how)
        .drop(SALT_COL)
    )
