"""Scaling probe for the streaming toolbox (round 8): events replicated
1x/4x/16x (user_ids shifted per copy) and replayed as 3 time-sliced
micro-batches through the three state-shape archetypes:

- dedup_stream: double-delivered stream, engine-managed key state
  (dropDuplicatesWithinWatermark) — state is one entry per key in the
  horizon, work is hash-lookup per row;
- stateful_funnel: applyInPandasWithState, two scalars per key, Python
  fold cost proportional to funnel-relevant rows;
- maintain_rollup_table: update-mode windowed agg + foreachBatch upsert —
  shuffle carries bucket cardinality, not event cardinality.

Expected: wall time is micro-batch-scheduling-dominated at 1x and grows
sublinearly until the data term takes over; none of the three holds
per-key state proportional to event volume.
"""
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from fireworks_spark import streaming
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table

spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
ev = table(spark, "/root/testdata/sf0.1", "events").select(
    "event_id", "user_id", "ts", "event_type", "value"
)


def stage_slices(src, d, n=3):
    qs = src.select(F.col("ts").cast("double").alias("t")).approxQuantile(
        "t", [i / n for i in range(1, n)], 0.001
    )
    stage = os.path.join(d, "staged")
    os.makedirs(stage)
    base = os.stat(stage).st_mtime
    t = F.col("ts").cast("double")
    for i in range(n):
        s = src
        if i > 0:
            s = s.filter(t > qs[i - 1])
        if i < n - 1:
            s = s.filter(t <= qs[i])
        sd = os.path.join(d, f"s{i}")
        s.coalesce(1).write.parquet(sd)
        for nm in sorted(os.listdir(sd)):
            if nm.endswith(".parquet"):
                dst = os.path.join(stage, f"part-{i:03d}.parquet")
                shutil.copy(os.path.join(sd, nm), dst)
                os.utime(dst, (base + i + 1, base + i + 1))
    return stage


for k in (1, 4, 16):
    r = spark.range(k).select(F.col("id").alias("_c"))
    d0 = (
        ev.crossJoin(F.broadcast(r))
        .withColumn("user_id", F.col("user_id") + F.col("_c") * 10_000_000)
        .withColumn(
            "event_id", F.col("event_id") + F.col("_c") * 1_000_000_000
        )
        .drop("_c")
        .persist()
    )
    n = d0.count()
    tmp = tempfile.mkdtemp(prefix="fw_probe_")
    try:
        stage = stage_slices(d0, tmp)
        sch = spark.read.parquet(stage).schema

        def reader():
            return (
                spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", "1")
                .parquet(stage)
            )

        # 1) dedup_stream: re-deliver every slice twice
        dup = os.path.join(tmp, "dup")
        os.makedirs(dup)
        base = os.stat(dup).st_mtime
        for i, nm in enumerate(sorted(os.listdir(stage)) * 2):
            dst = os.path.join(dup, f"part-{i:03d}.parquet")
            shutil.copy(os.path.join(stage, nm), dst)
            os.utime(dst, (base + i + 1, base + i + 1))
        s = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(dup)
        )
        t0 = time.perf_counter()
        streaming.run_to_memory(
            streaming.dedup_stream(s, watermark="365 days"),
            f"p_dedup_{k}", "append",
        )
        print(
            f"dedup_stream {k}x ({2*n} delivered): "
            f"{time.perf_counter()-t0:.2f}s", flush=True,
        )

        # 2) stateful funnel
        t0 = time.perf_counter()
        streaming.run_to_memory(
            streaming.stateful_funnel(
                reader(), ["view", "click", "purchase"]
            ),
            f"p_funnel_{k}", "update",
        )
        print(
            f"stateful_funnel {k}x ({n} events): "
            f"{time.perf_counter()-t0:.2f}s", flush=True,
        )

        # 3) rollup maintenance
        tbl = os.path.join(tmp, "rollup")
        t0 = time.perf_counter()
        streaming.maintain_rollup_table(
            reader(), tbl, window="1 hour", watermark="365 days"
        )
        print(
            f"maintain_rollup {k}x ({n} events): "
            f"{time.perf_counter()-t0:.2f}s", flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    d0.unpersist()
