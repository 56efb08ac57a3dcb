"""Vector column math over array<float>/array<double> embeddings.

Built from F.zip_with / F.aggregate — JVM-side higher-order functions, no
Python in the hot path (SURVEY.md steers: built-ins first, Pandas UDFs
only when built-ins can't express the op)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: str | Column) -> Column:
    """Cast array<float> -> array<double> so all math runs in double
    (matches the oracle, which casts to DOUBLE[])."""
    col = vec if isinstance(vec, Column) else F.col(vec)
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (same convention the
    oracle SQL spells out explicitly)."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))
