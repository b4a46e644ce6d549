"""Scaling probes for the round-7 events-analytics operators: funnel and
retention. Events replicated 1x/4x/16x with shifted user_ids (each copy a
full parallel population — cohort/funnel structure preserved per copy)."""
import time

from pyspark.sql import functions as F

from fireworks_spark.operators.timeagg import funnel_counts, retention_cohorts
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table

spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
ev = table(spark, "/root/testdata/sf0.1", "events").select(
    "user_id", "ts", "event_type"
)

for k in (1, 4, 16):
    r = spark.range(k).select(F.col("id").alias("_c"))
    d = (
        ev.crossJoin(F.broadcast(r))
        .withColumn("user_id", F.col("user_id") + F.col("_c") * 10_000_000)
        .drop("_c")
        .persist()
    )
    n = d.count()
    for name, fn in {
        "funnel_counts (3 steps)": lambda x: funnel_counts(
            x, ["view", "click", "purchase"]
        ),
        "retention_cohorts (week)": lambda x: retention_cohorts(x),
    }.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(d).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name} {k}x ({n} events): {best:.2f}s")
    d.unpersist()
