"""Measured scaling probes for the round-6 operators: exact-substring
removal, graded contamination report, media block hash + Hamming pairs.
Same replicated-documents method as scaling_probe_docs.py (sf0.1 docs
replicated 1x/4x/16x with shifted ids — identical text per copy, the
adversarial duplicate structure). Results land in SCALE.md."""
import time

from pyspark.sql import functions as F

from fireworks_spark.operators import dedup, multimodal
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
bench = base.filter(F.col("doc_id") % 97 == 0)

OPS = {
    "substring_dedup (k=20, hash)": lambda d: dedup.substring_dedup(d, k=20),
    "contamination_report": lambda d: dedup.contamination_report(
        d, bench, n=3, threshold=0.5
    ),
    "media_blockhash": lambda d: multimodal.media_blockhash(
        d.select("doc_id", F.encode("text", "UTF-8").alias("media")),
        "media",
        "doc_id",
    ),
    "media_dup_pairs (h<=8)": lambda d: multimodal.media_dup_pairs(
        d.select("doc_id", F.encode("text", "UTF-8").alias("media")),
        "media",
        "doc_id",
        max_hamming=8,
    ),
}

for k in (1, 4, 16):
    d = replicate(base, k).persist()
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
