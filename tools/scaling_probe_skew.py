"""Skewed-key probe for the funnel heavy-key guard (round 8): ONE key
holds 50% of all events (the bot pattern the per-key collect_list fold is
exposed to). Measures funnel_counts exact vs max_events_per_key-guarded at
1x/4x/16x of sf0.1 events.

Expected shape: the exact fold's skewed task grows linearly with the bot
key's event count (one task materializes the whole array); the guarded run
collapses the bot's same-type runs inside the window pre-pass (partition-
parallel after the key shuffle, but the array that reaches the fold is
bounded by the alternation count / cap), so its per-key state stays flat.
"""
import time

from pyspark.sql import functions as F

from fireworks_spark.operators.timeagg import funnel_counts
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table

spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
ev = table(spark, "/root/testdata/sf0.1", "events").select(
    "user_id", "ts", "event_type"
)

for k in (1, 4, 16):
    r = spark.range(k).select(F.col("id").alias("_c"))
    base = (
        ev.crossJoin(F.broadcast(r))
        .withColumn("user_id", F.col("user_id") + F.col("_c") * 10_000_000)
        .drop("_c")
    )
    # the bot: a copy of EVERY event reassigned to one key (key -1 holds
    # 50% of the union); types keep the fixture's natural mix, which
    # random-interleaves view/click/purchase — the hardest case for the
    # run-collapse (few same-type runs), so the cap does the bounding
    bot = base.withColumn("user_id", F.lit(-1))
    d = base.unionByName(bot).persist()
    n = d.count()
    for name, fn in {
        "funnel exact": lambda x: funnel_counts(
            x, ["view", "click", "purchase"]
        ),
        "funnel guarded (cap=64)": lambda x: funnel_counts(
            x, ["view", "click", "purchase"], max_events_per_key=64
        ),
    }.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(d).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name} {k}x ({n} events, bot=50%): {best:.2f}s", flush=True)
    d.unpersist()
