#!/usr/bin/env python
"""A/B probe: JVM-expression simhash vs the Arrow-kernel simhash64
(VERDICT r14 optional #7).

q33 is the suite's second most window-sensitive query after q147 because
its signature computation is a per-row Arrow pass, and this host's
degraded windows hit Python workers ~16x while JVM stages read ~2x. The
signature IS expressible per-row in pure JVM expressions — bit b of the
signature is 1 iff sum over token hashes of ((h>>b)&1 ? +1 : -1) > 0,
i.e. 2*count(bit set) > n_tokens — via one F.aggregate fold over the
token-hash array with a 64-element accumulator. No shuffle either way;
the trade is numpy throughput + Arrow transfer vs codegen'd HOF loop +
a one-off wide-expression compile.

History: an earlier 64-conditional-sum AGGREGATE variant (groupBy bit
sums) lost to the Arrow kernel (shuffle + multi-second codegen compile,
simhash64 docstring). This probe tests the per-row shape instead.
Adoption rule (VERDICT): only on a measured win at BOTH sf0.1 and sf1.

Usage: python tools/probe_simhash_jvm.py [--sf-dir /root/testdata/sf0.1]
       [--reps 3] [--check]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def simhash64_jvm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pure-JVM per-row simhash: fold the token-hash array once,
    accumulating the 64 per-bit set-counts in an array<int> accumulator;
    bit b of the result is 1 iff 2*cnt[b] > n_tokens (ties to 0 —
    identical to simhash64's sum-of-±1 > 0 rule)."""
    from fireworks_spark.functions.text import words
    from fireworks_spark.operators.spread import spread

    import functools

    hashed = spread(df).select(
        id_col,
        F.transform(words(text_col), lambda w: F.xxhash64(w)).alias("_th"),
    )
    # One fold over the token array, carrying all 64 per-bit set-counts
    # in an array<int> accumulator; bit positions are unrolled statically
    # because shiftleft/shiftrightunsigned take only literal shift
    # amounts in the DataFrame API.
    cnts = F.aggregate(
        F.col("_th"),
        F.array(*[F.lit(0) for _ in range(64)]),
        lambda acc, h: F.array(
            *[
                acc[b]
                + F.shiftrightunsigned(h, b)
                .bitwiseAND(F.lit(1))
                .cast("int")
                for b in range(64)
            ]
        ),
    )
    n = F.size("_th")
    sig = functools.reduce(
        lambda a, x: a.bitwiseOR(x),
        [
            F.when(
                F.col("_c")[b] * 2 > n,
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
            for b in range(64)
        ],
    )
    return hashed.withColumn("_c", cnts).select(
        id_col, sig.alias("simhash")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="assert bit-exact parity vs simhash64 first")
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from fireworks_spark.operators.dedup import simhash64
    from fireworks_spark.session import get_spark
    from fireworks_spark.tables import table

    spark = get_spark(app_name="simhash-ab", master=args.master,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, args.sf_dir, "documents")

    if args.check:
        a = {r.doc_id: r.simhash for r in simhash64(d).collect()}
        b = {r.doc_id: r.simhash for r in simhash64_jvm(d).collect()}
        diff = {k for k in a if a[k] != b.get(k)}
        print(f"parity: {len(a)} docs, {len(diff)} diffs")
        if diff:
            k = sorted(diff)[0]
            print("first diff", k, hex(a[k]), hex(b[k]))
            sys.exit(1)

    for label, fn in (("arrow", simhash64), ("jvm", simhash64_jvm)):
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(d).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: reps={times} min={min(times)}")


if __name__ == "__main__":
    main()
