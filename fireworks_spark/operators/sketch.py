"""Misra-Gries heavy-hitters sketch with exact-recount verification — the
mergeable frequent-items sketch for key-skew discovery over data too large
to group exactly first. (The reference has no sketch layer; its nearest
analog is eager whole-frame value_counts, which does not scale. This is
the SpaceSaving/Misra-Gries shape every large-scale profiler uses.)

Scale story (100 TB):
- Pass 1 streams each partition through an O(capacity)-memory Misra-Gries
  summary inside an Arrow batch task; only <= capacity candidate keys per
  PARTITION ever leave the executors (plus one row-count row), so the
  collect is bounded by partitions x capacity regardless of row count.
- Guarantee (pigeonhole over partitions): any key with global frequency
  > n/(capacity+1) exceeds n_p/(capacity+1) in at least one partition, and
  per-partition Misra-Gries retains every such key. The candidate union
  therefore contains ALL true heavy hitters — no false negatives.
- Pass 2 recounts ONLY candidate keys exactly (broadcast semi-join filter,
  partial-aggregated groupBy whose shuffle carries candidate keys only)
  and applies the exact threshold — no false positives either. Output is
  deterministic and SQL-checkable: exactly the keys with exact count
  > n/capacity (q112's DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_partition_candidates", "heavy_hitters_sketch"]


def _mg_fold(counters: dict, key, w: int, capacity: int) -> None:
    """Weighted Misra-Gries update: add w to key, then restore the
    <= capacity invariant by subtracting the minimum count from every
    counter and dropping zeros (the batch form of the classic decrement)."""
    counters[key] = counters.get(key, 0) + w
    if len(counters) > capacity:
        m = min(counters.values())
        for k in list(counters):
            counters[k] -= m
            if counters[k] <= 0:
                del counters[k]


def mg_partition_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, residual weight) rows for
    the surviving counters, plus one null-key row per partition carrying
    that partition's total row count (so the caller derives n without a
    second full scan)."""
    key_type = dict(df.dtypes)[key_col]

    def _summarize(batches):
        import pandas as pd

        counters: dict = {}
        total = 0
        for b in batches:
            if not len(b):
                continue
            total += len(b)
            for key, w in b[key_col].value_counts(dropna=False).items():
                _mg_fold(counters, key, int(w), capacity)
        yield pd.DataFrame(
            {
                key_col: [*counters.keys(), None],
                "w": [*counters.values(), total],
                "is_total": [*([False] * len(counters)), True],
            }
        )

    return df.select(key_col).mapInPandas(
        _summarize, f"{key_col} {key_type}, w long, is_total boolean"
    )


def heavy_hitters_sketch(
    df: DataFrame, key_col: str, capacity: int = 100
) -> DataFrame:
    """Exact counts of every key with frequency > n/capacity, found with
    bounded memory: Misra-Gries candidates (no false negatives, see module
    doc), then an exact recount restricted to candidates (no false
    positives). Returns (key_col, cnt) sorted by cnt desc."""
    spark = df.sparkSession
    summaries = mg_partition_candidates(df, key_col, capacity).persist()
    try:
        # both collects are bounded by partitions x capacity rows; pulling
        # them now (off the cached pass-1 result) means pass 1 runs ONCE
        n = summaries.filter("is_total").agg(F.sum("w")).collect()[0][0] or 0
        cand_rows = (
            summaries.filter(~F.col("is_total"))
            .select(key_col)
            .distinct()
            .collect()
        )
    finally:
        summaries.unpersist()
    candidates = spark.createDataFrame(
        cand_rows, schema=df.select(key_col).schema
    )
    exact = (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    thresh = n / capacity
    return exact.filter(F.col("cnt") > F.lit(thresh)).orderBy(
        F.desc("cnt"), key_col
    )
