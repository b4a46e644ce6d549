"""1x/4x/16x scaling probe for the sampling + Bloom decontamination ops
(same method as scaling_probe_docs.py: replicated sf0.1 documents,
warm workers, best-of-2, noop-write materialization)."""
import time, json
from fireworks_spark.session import get_spark
from pyspark.sql import functions as F
from fireworks_spark.tables import table

spark = get_spark(shuffle_partitions=32); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

def replicate(df, id_col, k):
    r = spark.range(k).select(F.col("id").alias("_copy"))
    return (df.crossJoin(F.broadcast(r))
              .withColumn(id_col, F.col(id_col) + F.col("_copy") * F.lit(10_000_000))
              .drop("_copy"))

docs = table(spark, sf, "documents").persist(); docs.count()
bench = docs.filter(F.col("doc_id") % 89 == 0).persist(); bench.count()

from fireworks_spark.operators import dedup, ranking, toolbox

_W = [((i * 37) % 21 - 10) / 16.0 for i in range(64)]

OPS = {
    "decontaminate_exact": lambda d: dedup.decontaminate(
        d.filter(F.col("doc_id") % 89 != 0), bench),
    "decontaminate_bloom": lambda d: dedup.bloom_decontaminate(
        d.filter(F.col("doc_id") % 89 != 0), bench),
    "weighted_sample": lambda d: toolbox.weighted_sample(
        d, "n_chars", k=20, group_col="source"),
    "token_budget_sample": lambda d: toolbox.token_budget_sample(
        d, "n_chars", budget=20_000, group_col="source"),
    "minhash_join": lambda d: dedup.minhash_join(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1), threshold=0.8),
    "hashed_score": lambda d: ranking.hashed_score(d, _W, pool="sum"),
    "temperature_mix": lambda d: toolbox.temperature_mix(d, "source", 0.5),
}

def run_once(fn, d):
    t0 = time.perf_counter()
    fn(d).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache(); docs.count(); bench.count()
    return dt

for op, fn in OPS.items():   # warm (JIT, python workers) — unrecorded
    run_once(fn, docs)
out = {}
for k in (1, 4, 16):
    d = replicate(docs, "doc_id", k).persist(); nd = d.count()
    for op, fn in OPS.items():
        dt = min(run_once(fn, d) for _ in range(2))
        out.setdefault(op, {})[k] = round(dt, 2)
        print(f"{op} x{k} ({nd} docs): {dt:.2f}s", flush=True)
    d.unpersist()
print(json.dumps(out))
