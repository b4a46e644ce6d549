"""As-of (nearest-predecessor) join — the time-series operator Spark's
DataFrame API lacks (pandas merge_asof / DuckDB ASOF JOIN semantics).

Spark-first design: NOT a range join (inequality joins degenerate to
nested-loop or explode into per-key cross products). Instead the two sides
are tagged and unioned, then one window per key ordered by event time
carries the most recent right-side payload forward with
``last(ignorenulls)``; left rows then read their match from the running
state. Cost = ONE shuffle on the key (the same shuffle any per-key
operation pays), state = one row — this survives 100 TB of ticks because
nothing ever materializes a pair set.

Semantics checked against DuckDB's native ASOF JOIN (q29 oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fireworks_spark.functions.time import epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_r",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (backward as-of, inclusive —
    DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``).

    Output = every left row + ``right_cols`` (suffixed) + ``{ts_col}{suffix}``
    (the matched right timestamp); unmatched left rows keep nulls.
    ``tolerance_micros`` nulls out matches older than the window (pandas
    merge_asof ``tolerance``). If ``right`` has several rows at the exact
    same (key, ts), the last one in (ts, right_cols) order wins —
    deterministic, matching the oracle's max-over-ties.
    """
    l_marker, r_marker = 1, 0
    lhs = left
    for c in right_cols:
        lhs = lhs.withColumn(f"{c}{suffix}", F.lit(None))
    lhs = lhs.withColumn(f"{ts_col}{suffix}", F.lit(None).cast("timestamp"))
    lhs = lhs.withColumn("_side", F.lit(l_marker))

    rhs = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    rhs = rhs.withColumn(f"{ts_col}{suffix}", F.col(ts_col))
    for c in left.columns:
        if c not in key_cols and c != ts_col:
            rhs = rhs.withColumn(c, F.lit(None))
    rhs = rhs.withColumn("_side", F.lit(r_marker))

    u = lhs.unionByName(rhs.select(*lhs.columns))
    # right rows sort before left rows at equal ts => inclusive match;
    # suffixed payload cols break exact-duplicate right ties deterministically
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_side", *[f"{c}{suffix}" for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u
    for c in [*[f"{c}{suffix}" for c in right_cols], f"{ts_col}{suffix}"]:
        matched = matched.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == l_marker).drop("_side")
    if tolerance_micros is not None:
        stale = (
            epoch_micros(ts_col) - epoch_micros(f"{ts_col}{suffix}")
        ) > tolerance_micros
        for c in [*[f"{c}{suffix}" for c in right_cols], f"{ts_col}{suffix}"]:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c))
            )
    return out
