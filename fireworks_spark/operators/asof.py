"""As-of (nearest-predecessor/successor) join — the time-series operator
Spark's DataFrame API lacks (pandas merge_asof / DuckDB ASOF JOIN
semantics).

Spark-first design: NOT a range join (inequality joins degenerate to
nested-loop or explode into per-key cross products). Instead the two sides
are tagged and unioned, then one window per key ordered by event time
carries the most recent (backward) or next (forward) right-side payload to
each left row with ``last(ignorenulls)``. Cost = ONE shuffle on the key
(the same shuffle any per-key operation pays) — ``nearest`` adds a second
sort over the SAME partitioning, still one shuffle — state = one row; this
survives 100 TB of ticks because nothing ever materializes a pair set.

Semantics checked against DuckDB's native ASOF JOIN (q29 oracle) and
pandas.merge_asof for all three directions (tests/test_asof.py).
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ONE right row for the same key:

    - ``backward`` (default): the latest right with ``right.ts <= left.ts``
      (DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``);
    - ``forward``: the earliest right with ``right.ts >= left.ts``;
    - ``nearest``: whichever of the two is closer in absolute time,
      ties going backward (pandas merge_asof's direction= semantics).

    Output = every left row + ``right_cols`` (suffixed) + ``{ts_col}{suffix}``
    (the matched right timestamp); unmatched left rows keep nulls.
    ``tolerance_micros`` nulls out matches farther than the window in the
    match direction (pandas ``tolerance``; requires a timestamp ts column).
    If ``right`` has several rows at the exact same (key, ts), the one with
    the greatest (right_cols) tuple wins in every direction —
    deterministic, matching the q29 oracle's max-over-ties.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
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
    payload = [f"{c}{suffix}" for c in right_cols]
    carried = [*payload, f"{ts_col}{suffix}"]

    # backward: ascending time; right rows sort before left rows at equal
    # ts => inclusive match; payload cols break exact-duplicate right ties
    # deterministically (last-in-order == greatest payload).
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), *[F.col(c).asc() for c in payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: DESCENDING time traversal, so "preceding" rows have ts >=
    # current and last(ignorenulls) picks the earliest such right row. At
    # equal ts rights still precede lefts (inclusive); ascending payload in
    # the traversal makes the greatest payload the nearest, matching
    # backward's tie rule.
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc(), *[F.col(c).asc() for c in payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # Carry the WHOLE right row as one struct, not column-by-column: with
    # per-column last(ignorenulls), a NULL in one right payload column lets
    # that column fall through to an OLDER right row, stitching the output
    # match from several right rows (and ts_r may not be the row a payload
    # value came from). The struct is non-NULL exactly on right rows, so a
    # single last(ignorenulls) always picks one intact right row — matching
    # pandas merge_asof / DuckDB ASOF row semantics even with NULL payloads.
    u = u.withColumn(
        "_rrow",
        F.when(F.col("_side") == r_marker, F.struct(*carried)),
    )

    def _unpack(frame: DataFrame, src: str) -> DataFrame:
        for c in carried:
            frame = frame.withColumn(c, F.col(src).getField(c))
        return frame.drop(src)

    if direction in ("backward", "forward"):
        w = wb if direction == "backward" else wf
        matched = u.withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
        out = matched.filter(F.col("_side") == l_marker).drop("_side", "_rrow")
        if tolerance_micros is not None:
            delta = epoch_micros(ts_col) - epoch_micros(
                F.col("_m").getField(f"{ts_col}{suffix}")
            )
            stale = (delta if direction == "backward" else -delta) > tolerance_micros
            out = out.withColumn(
                "_m", F.when(stale, F.lit(None)).otherwise(F.col("_m"))
            )
        return _unpack(out, "_m")

    # nearest: both carries over the SAME hash partitioning (one Exchange,
    # two sorts), then a per-row choice by absolute delta, ties backward.
    matched = u.withColumn(
        "_b", F.last("_rrow", ignorenulls=True).over(wb)
    ).withColumn("_f", F.last("_rrow", ignorenulls=True).over(wf))
    out = matched.filter(F.col("_side") == l_marker).drop("_side", "_rrow")
    ts_field = f"{ts_col}{suffix}"
    db = epoch_micros(ts_col) - epoch_micros(F.col("_b").getField(ts_field))
    df_ = epoch_micros(F.col("_f").getField(ts_field)) - epoch_micros(ts_col)
    if tolerance_micros is not None:
        db = F.when(db > tolerance_micros, F.lit(None)).otherwise(db)
        df_ = F.when(df_ > tolerance_micros, F.lit(None)).otherwise(df_)
    take_backward = F.when(
        db.isNotNull() & (df_.isNull() | (db <= df_)), F.lit(True)
    ).otherwise(F.lit(False))
    take_forward = (~take_backward) & df_.isNotNull()
    out = out.withColumn(
        "_m",
        F.when(take_backward, F.col("_b"))
        .when(take_forward, F.col("_f"))
        .otherwise(F.lit(None)),
    ).drop("_b", "_f")
    return _unpack(out, "_m")
