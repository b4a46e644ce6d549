"""Round-9 scaling probe: one more doubling decade (1x/4x/16x/64x) for the
families whose bounded-cost claims carry the 100 TB argument — dedup, ANN,
streaming state, and the skewed-key funnel — plus the round-9
ngram_repetition fused pass (per-row cost check after the token-interning
change).

Method: same replicated-fixture approach as the earlier probes (sf0.1
tables crossJoined with a broadcast range, ids shifted per copy, so the
duplicate structure gets DENSER with scale — each doc gains k-1 identical
twins, the adversarial case for similarity joins). Results land in
SCALE.md (round-9 table).

Scales come from SPARK_GRAFT_PROBE_SCALES (default "1,4,16,64"), so a
spot-check can run a single scale.
"""
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from fireworks_spark import streaming
from fireworks_spark.operators import dedup, pq, ranking
from fireworks_spark.operators import similarity as sim
from fireworks_spark.operators.timeagg import funnel_counts
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table

SCALES = tuple(
    int(s)
    for s in os.environ.get("SPARK_GRAFT_PROBE_SCALES", "1,4,16,64").split(",")
)
spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
out: dict = {}


def replicate(df, id_col, k, shift=10_000_000):
    r = spark.range(k).select(F.col("id").alias("_c"))
    return (
        df.crossJoin(F.broadcast(r))
        .withColumn(id_col, F.col(id_col) + F.col("_c") * F.lit(shift))
        .drop("_c")
    )


def timed(name, k, n, fn, best_of=2):
    best = None
    for _ in range(best_of):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out.setdefault(name, {})[k] = round(best, 2)
    print(f"{name} {k}x ({n} rows): {best:.2f}s", flush=True)


# ---- dedup family ---------------------------------------------------------
docs = table(spark, sf, "documents").select("doc_id", "text")
DEDUP_OPS = {
    "exact_dedup": lambda d: dedup.exact_dedup(d),
    "minhash_pairs": lambda d: dedup.minhash_dedup_pairs(d, threshold=0.8),
    "minhash_join": lambda d: dedup.minhash_join(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        0.8,
    ),
    "simhash_pairs": lambda d: dedup.simhash_pairs(d, max_hamming=3),
    "ngram_repetition": lambda d: ranking.ngram_repetition(d),
}
for op, fn in DEDUP_OPS.items():  # warm: JIT + python workers, unrecorded
    fn(docs).write.mode("overwrite").format("noop").save()
for k in SCALES:
    d = replicate(docs, "doc_id", k).persist()
    n = d.count()
    for op, fn in DEDUP_OPS.items():
        timed(op, k, n, lambda fn=fn: fn(d))
    d.unpersist()

# ---- ANN family -----------------------------------------------------------
embs = table(spark, sf, "embeddings").select("vec_id", "embedding")
queries = embs.filter(F.col("vec_id") % 100 == 7).limit(20).persist()
queries.count()
# train the quantizers ONCE (index build is amortized over a corpus's
# lifetime; the scaling claim under test is the SEARCH path)
import numpy as np

from fireworks_spark.operators.similarity import _spherical_kmeans

_sample = np.stack(
    [
        np.asarray(r[0], dtype=np.float64)
        for r in embs.select("embedding").collect()
    ]
)
C16 = _spherical_kmeans(_sample, 16, seed=42)
CB = pq.pq_train(embs, 8, 8, "embedding", seed=42)
ANN_OPS = {
    "ann_brute_topk": lambda b: sim.cosine_topk(b, queries, k=5),
    "ann_lsh_topk": lambda b: sim.lsh_bucket_topk(
        b, queries, k=5, num_bits=8, dim=64
    ),
    "ann_ivf_topk": lambda b: sim.ivf_topk(
        b, queries, k=5, nprobe=2, num_clusters=16, centroids=C16
    ),
    "ann_ivfpq_topk": lambda b: pq.ivfpq_topk(
        b, queries, k=5, nprobe=2, num_clusters=16,
        centroids=C16, codebooks=CB,
    ),
}
for op, fn in ANN_OPS.items():
    fn(embs).write.mode("overwrite").format("noop").save()
for k in SCALES:
    b = replicate(embs, "vec_id", k).persist()
    n = b.count()
    for op, fn in ANN_OPS.items():
        timed(op, k, n, lambda fn=fn: fn(b))
    b.unpersist()

# ---- streaming state ------------------------------------------------------
ev = table(spark, sf, "events").select(
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


for k in SCALES:
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
    tmp = tempfile.mkdtemp(prefix="fw_probe9_")
    try:
        stage = stage_slices(d0, tmp)
        sch = spark.read.parquet(stage).schema

        def reader():
            return (
                spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", "1")
                .parquet(stage)
            )

        t0 = time.perf_counter()
        streaming.run_to_memory(
            streaming.dedup_stream(reader(), watermark="365 days"),
            f"p9_dedup_{k}",
            "append",
        )
        dt = time.perf_counter() - t0
        out.setdefault("stream_dedup", {})[k] = round(dt, 2)
        print(f"stream_dedup {k}x ({n}): {dt:.2f}s", flush=True)

        t0 = time.perf_counter()
        streaming.run_to_memory(
            streaming.stateful_funnel(
                reader(), ["view", "click", "purchase"]
            ),
            f"p9_funnel_{k}",
            "update",
        )
        dt = time.perf_counter() - t0
        out.setdefault("stream_funnel", {})[k] = round(dt, 2)
        print(f"stream_funnel {k}x ({n}): {dt:.2f}s", flush=True)

        tbl = os.path.join(tmp, "rollup")
        t0 = time.perf_counter()
        streaming.maintain_rollup_table(
            reader(), tbl, window="1 hour", watermark="365 days"
        )
        dt = time.perf_counter() - t0
        out.setdefault("stream_rollup", {})[k] = round(dt, 2)
        print(f"stream_rollup {k}x ({n}): {dt:.2f}s", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    d0.unpersist()

# ---- skewed-key funnel (one key holds 50% of all events) ------------------
evf = ev.select("user_id", "ts", "event_type")
for k in SCALES:
    base = replicate(evf, "user_id", k)
    bot = base.withColumn("user_id", F.lit(-1))
    d = base.unionByName(bot).persist()
    n = d.count()
    timed(
        "funnel_exact_bot50",
        k,
        n,
        lambda: funnel_counts(d, ["view", "click", "purchase"]),
    )
    timed(
        "funnel_guarded_bot50",
        k,
        n,
        lambda: funnel_counts(
            d, ["view", "click", "purchase"], max_events_per_key=64
        ),
    )
    d.unpersist()

print(json.dumps(out))
