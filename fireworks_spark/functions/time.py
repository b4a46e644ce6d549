"""Time expression helpers.

The reference has no event-time layer (its streams are Python iterators,
reference fireworks/toolbox/pipes.py:48-63); these helpers exist for the
Spark-side time-series operators (as-of join, interval join, rolling
time windows) that must turn timestamps into epoch numbers for range
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP **or** TIMESTAMP_NTZ column.

    ``F.unix_micros`` raises AnalysisException on TIMESTAMP_NTZ input; a
    cast to TIMESTAMP first is a no-op for TIMESTAMP columns and, with the
    session timezone pinned to UTC (session.py), interprets NTZ wall-clock
    values as the identical UTC instant — matching DuckDB's reading of the
    same parquet. Pure JVM expression, stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
