#!/usr/bin/env python
"""Time a subset of registry queries under bench conditions (one warm
session, local[$SPARK_GRAFT_CPUS], shuffle=cpus, noop-write materialize).

    python tools/time_query.py q174_stream_restart [q167_... ...] [--reps N]

Prints per-rep wall seconds to stdout. Used for regression bisects —
bench.py stays the only writer of BENCH_LOCAL.json.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # match bench conditions: scratch warehouse opt-in (session.get_spark)
    os.environ.setdefault("FIREWORKS_SCRATCH_WAREHOUSE", "1")

    from fireworks_spark.operators.dedup import release_caches
    from fireworks_spark.registry import QUERIES
    from fireworks_spark.session import get_spark

    spark = get_spark(
        app_name="fw-time-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if str(cpus).isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("WARN")
    from fireworks_spark.tables import table

    # minimal warmup: JVM + python worker pool
    t = table(spark, sf_dir, "nation")
    t.repartition(8).mapInPandas(lambda it: it, t.schema).count()

    for name in names:
        fn = QUERIES[name]
        for i in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            release_caches(df)
            spark.catalog.clearCache()
            print(f"{name} rep{i}: {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
