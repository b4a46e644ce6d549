"""Range (interval-containment) join — the second time-series operator
Spark's API lacks as a primitive (DuckDB/pandas interval joins; Spark
plans raw `l.ts BETWEEN r.lo AND r.hi` as a nested-loop or per-key cross
product).

Spark-first design: discretize time into fixed buckets. Each point lands in
exactly ONE bucket; each interval explodes into the (few) buckets it
overlaps. The join becomes an equi-join on (keys..., bucket) followed by an
exact containment filter. Because a point has a single bucket, every
(point, interval) pair meets at most once — no post-join dedup. Cost scales
with interval_width / bucket_width (replication factor), never with
|left| x |right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fireworks_spark.functions.time import epoch_micros


def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_micros: int = 900 * 10**6,
) -> DataFrame:
    """Inner join of points to the intervals containing them:
    ``right.start <= left.ts < right.end`` (+ equality on ``keys``).

    Pick ``bucket_micros`` near the typical interval width: replication of
    each interval is ceil(width/bucket)+1 rows, so a 1-hour interval at the
    default 15-minute bucket costs <= 5 copies — the price of turning an
    inequality join into a shuffle-boundable equi-join. Degenerate (empty)
    intervals are dropped, matching the half-open containment predicate.
    """
    keys = keys or []
    b = F.lit(bucket_micros).cast("long")
    lb = left.withColumn(
        "_b", F.floor(epoch_micros(ts_col) / b).cast("long")
    )
    rb = (
        right.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(epoch_micros(start_col) / b).cast("long"),
                    F.floor(
                        (epoch_micros(end_col) - F.lit(1)) / b
                    ).cast("long"),
                )
            ),
        )
    )
    return (
        lb.join(rb, [*keys, "_b"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_b")
    )
