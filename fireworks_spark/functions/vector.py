"""Vector (tensor-column) expressions — pure Catalyst higher-order functions.

The reference stores vectors as torch.Tensor columns (TensorMessage,
reference fireworks/core/message.py:794-1138); here they are
ARRAY<FLOAT/DOUBLE> columns and the math stays JVM-side: `zip_with` +
`aggregate` compile to Catalyst expressions, so no Python worker is involved
and the same expressions run unchanged on a 1000-executor cluster.

Determinism note: `aggregate` is a strict left fold, so float summation order
is fixed — required for oracle-differential checks (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product of two array columns (double precision)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = dot / (|a| * |b|); computed as dot/(sqrt(na)*sqrt(nb))
    to mirror the oracle formula exactly."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
