"""Vector math over ArrayType columns — pure JVM, no Python in the row path.

All math is done in float64 with left-to-right accumulation, which makes
results bit-reproducible and lets the DuckDB oracle compute identical
values with the same formula.

Two forms, same numeric result:
- `dot`/`cosine` — higher-order-function folds for arbitrary dimension.
  Spark evaluates HOF lambdas in interpreted mode (they are excluded from
  whole-stage codegen), so these cost ~10× more per element.
- `dot_fixed`/`cosine_fixed` — flat expression trees for a schema-known
  dimension (embeddings are fixed dim=64 here).  A flat sum is ordinary
  arithmetic, codegen-eligible, and accumulates in the same left-to-right
  order as the fold, so values are bit-identical to the HOF form.  Use
  these on hot paths (ANN candidate scoring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """Cast array<float> → array<double> so accumulation runs in f64."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — zip_with product then a sequential double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL-safe on zero vectors via nullif."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot_sql(a: str, b: str, dim: int) -> str:
    """Flat dim-term sum as ONE SQL string.

    Building the same tree Column-by-Column costs hundreds of py4j round
    trips (~3 s of driver time per query at dim=64, measured); a single
    `F.expr` parse is milliseconds.  The string parenthesizes left-to-
    right so accumulation order matches the HOF fold exactly."""
    terms = [
        f"CAST(element_at({a}, {i}) AS DOUBLE) * "
        f"CAST(element_at({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def dot_fixed(a: Column | str, b: Column | str, dim: int = 64) -> Column:
    """Σ aᵢ·bᵢ as a flat `dim`-term sum (codegen-eligible, fold-identical).

    Accepts column NAMES (fast path: one F.expr parse) or Column objects
    (falls back to py4j tree building for composed expressions)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b, dim))
    out = F.element_at(a, 1).cast("double") * F.element_at(b, 1).cast("double")
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return out


def cosine_fixed(a: Column | str, b: Column | str, dim: int = 64) -> Column:
    """cosine() for a schema-known dimension; NULL-safe on zero vectors."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"{_dot_sql(a, b, dim)} / NULLIF("
            f"SQRT({_dot_sql(a, a, dim)}) * SQRT({_dot_sql(b, b, dim)}), 0.0D)"
        )
    return dot_fixed(a, b, dim) / F.nullif(
        F.sqrt(dot_fixed(a, a, dim)) * F.sqrt(dot_fixed(b, b, dim)), F.lit(0.0)
    )


def norm_fixed(a: Column | str, dim: int = 64) -> Column:
    """‖a‖ as a flat dim-term sum — same accumulation as cosine_fixed's."""
    if isinstance(a, str):
        return F.expr(f"SQRT({_dot_sql(a, a, dim)})")
    return F.sqrt(dot_fixed(a, a, dim))


def cosine_prenormed(a: Column | str, b: Column | str,
                     norm_a: str = "qn", norm_b: str = "cn",
                     dim: int = 64) -> Column:
    """cosine_fixed with both norms precomputed per ROW instead of per PAIR.

    On an O(Q×N) candidate-scoring join this is the difference between 3
    dim-term sums per pair and 1: hoist `norm_fixed` onto each side before
    the join.  Values are identical to cosine_fixed — the norm expression
    is the same flat sum, merely evaluated earlier.  norm_a/norm_b are
    column NAMES of the precomputed norms."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"{_dot_sql(a, b, dim)} / NULLIF({norm_a} * {norm_b}, 0.0D)")
    return dot_fixed(a, b, dim) / F.nullif(F.col(norm_a) * F.col(norm_b),
                                           F.lit(0.0))


def normalize(a: Column) -> Column:
    """Unit-normalize; zero vectors stay NULL (propagated by division)."""
    n = F.nullif(norm(a), F.lit(0.0))
    return F.transform(a, lambda x: x / n)
