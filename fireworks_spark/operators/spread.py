"""Partition-spreading guard for expression-heavy scans.

A single small parquet file arrives as ONE input partition, which runs
every downstream per-row expression (regex tokenize, shingle hashing,
Arrow batches) on one core. ``spread`` repartitions to the session's
default parallelism ONLY when the input is badly under-partitioned; at
real scale inputs already carry >= cores partitions and it is a no-op —
the check inspects the physical plan's partitioning, it runs no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    # streaming frames have no .rdd (and micro-batch parallelism is the
    # source's concern) — pass through so every expression-only operator
    # built on spread (textstats, ranking, dedup signatures) also works
    # inside readStream pipelines
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
