"""Dense-vector math over ``array<float>`` columns, pure built-in
higher-order functions (JVM-side, no Python round-trip).

Accumulation is an ordered left fold (``F.aggregate``), so results are
bit-deterministic — required for oracle comparison and for reproducible
top-k under ties.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Rounded cosine: the cross-engine comparison form (double fold order is
    identical in Spark/DuckDB, but rounding removes any residual ulp noise)."""
    return F.round(cosine(a, b), digits)


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column, digits: int = 6) -> Column:
    """Cosine with the norms hoisted to per-ROW columns: inside a pairwise
    join, ``cosine(a, b)`` folds three times per PAIR (dot + both norms);
    passing precomputed norms makes it one fold per pair and one norm per
    row. The value is bit-identical to :func:`cosine_rounded` — same IEEE
    expression, evaluated once instead of |pairs| times."""
    return F.round(dot(a, b) / (norm_a * norm_b), digits)
