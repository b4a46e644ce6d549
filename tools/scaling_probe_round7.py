"""Measured scaling probes for the round-7 operators: Gopher quality-rule
suite and the full n-gram repetition rule set. Same replicated-documents
method as scaling_probe_round6.py (sf0.1 docs replicated 1x/4x/16x with
shifted ids). Both operators are pure per-row map stages, so the expected
curve is linear with a flat per-row cost; results land in SCALE.md."""
import time

from pyspark.sql import functions as F

from fireworks_spark.operators import ranking, textstats
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table

spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"


def replicate(df, k):
    r = spark.range(k).select(F.col("id").alias("_copy"))
    return (
        df.crossJoin(F.broadcast(r))
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("_copy") * F.lit(10_000_000)
        )
        .drop("_copy")
    )


base = table(spark, sf, "documents").select("doc_id", "text")
# the q153 8-word-line restructure, so the line rules do real work
structured = base.select(
    "doc_id",
    F.regexp_replace("text", r"((\S+ ){7}\S+) ", "$1\n").alias("text"),
)

OPS = {
    "gopher_stats (10 rules)": lambda d: textstats.gopher_stats(d),
    "ngram_repetition (one Arrow pass, round 8)": lambda d: ranking.ngram_repetition(d),
}

for k in (1, 4, 16):
    d = replicate(structured, k).persist()
    n = d.count()
    for name, fn in OPS.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(d).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name} {k}x ({n} docs): {best:.2f}s")
    d.unpersist()

# embedding-side round-7 ops: SQ8 and PCA whitening (injected basis so the
# probe measures the projection pass, not the quantizer fit)
from fireworks_spark.operators import embedstats, pq

emb = table(spark, sf, "embeddings").select("vec_id", "embedding")
basis = [
    [(1.0 if bin(k & d).count("1") % 2 == 0 else -1.0) / 8.0
     for d in range(64)]
    for k in range(8)
]
VARS = [1.0, 4.0, 0.25, 16.0, 1.0, 0.0625, 4.0, 1.0]


def replicate_emb(df, k):
    r = spark.range(k).select(F.col("id").alias("_copy"))
    return (
        df.crossJoin(F.broadcast(r))
        .withColumn(
            "vec_id", F.col("vec_id") + F.col("_copy") * F.lit(10_000_000)
        )
        .drop("_copy")
    )


EOPS = {
    "sq8_encode (JVM HOF)": lambda d: pq.sq8_encode(d),
    "pca_whiten (Arrow matmul)": lambda d: embedstats.pca_whiten(
        d, 8, components=basis, variances=VARS
    ),
}

for k in (1, 4, 16):
    d = replicate_emb(emb, k).persist()
    n = d.count()
    for name, fn in EOPS.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(d).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name} {k}x ({n} vecs): {best:.2f}s")
    d.unpersist()
