#!/usr/bin/env python
"""q174 regression bisect: time the stream-restart replay at several
shuffle-partition scopes under bench conditions (local[32] session,
32 session shuffle partitions, state store per shuffle partition).

    PYTHONPATH=. python tools/bisect_q174.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fireworks_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bisect-q174",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from fireworks_spark.queries_streaming import (  # noqa: E402
        _stream_shuffle,
        q174_stream_restart,
    )
    from fireworks_spark.tables import table  # noqa: E402

    t = table(spark, sf_dir, "nation")
    t.repartition(8).mapInPandas(lambda it: it, t.schema).count()

    def run(tag, n=None):
        for i in range(3):
            t0 = time.perf_counter()
            if n is None:
                df = q174_stream_restart(spark, sf_dir)
            else:
                with _stream_shuffle(spark, n=n):
                    df = q174_stream_restart(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            print(f"{tag} rep{i}: {time.perf_counter() - t0:.3f}s", flush=True)
            spark.catalog.clearCache()

    run("session32")
    run("scoped8", 8)
    run("scoped4", 4)
    run("scoped16", 16)
    run("session32-again")


if __name__ == "__main__":
    main()
