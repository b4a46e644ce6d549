#!/usr/bin/env python
"""Measure the applyInPandasWithState replay queries at session-32 vs
scoped-8 shuffle partitions (bench conditions)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fireworks_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bisect-pyfold", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    from fireworks_spark.queries_streaming import _stream_shuffle
    from fireworks_spark.registry import QUERIES
    from fireworks_spark.tables import table

    t = table(spark, sf_dir, "nation")
    t.repartition(8).mapInPandas(lambda it: it, t.schema).count()

    for name in ["q165_stream_funnel", "q176_stream_running_totals",
                 "q150_stateful_topk", "q172_stream_near_dedup"]:
        for tag, n in [("s32", None), ("sc8", 8)]:
            for i in range(2):
                t0 = time.perf_counter()
                if n is None:
                    df = QUERIES[name](spark, sf_dir)
                else:
                    with _stream_shuffle(spark, n=n):
                        df = QUERIES[name](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                print(f"{name} {tag} rep{i}: "
                      f"{time.perf_counter() - t0:.3f}s", flush=True)
                spark.catalog.clearCache()


if __name__ == "__main__":
    main()
