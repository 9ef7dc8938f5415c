"""Vector math over ArrayType columns — pure JVM higher-order functions.

Everything is built from `transform` / `zip_with` / `aggregate` so the hot
path stays inside whole-stage codegen (no Python).  All math is done in
float64 with left-fold accumulation, which makes results bit-reproducible
and lets the DuckDB oracle compute identical values with the same formula.
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


def normalize(a: Column) -> Column:
    """Unit-normalize; zero vectors stay NULL (propagated by division)."""
    n = F.nullif(norm(a), F.lit(0.0))
    return F.transform(a, lambda x: x / n)
