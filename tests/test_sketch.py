"""Misra-Gries sketch and multi-granularity time rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireworks_spark.operators.sketch import (
    _mg_fold,
    heavy_hitters_sketch,
    mg_partition_candidates,
)
from fireworks_spark.operators.timeagg import time_rollup


def test_mg_fold_classic_guarantee():
    """Feed a stream where one key holds 40% of the mass through a
    capacity-4 summary: the heavy key must survive with residual weight
    >= true_count - n/(capacity+1)."""
    counters: dict = {}
    stream = (["hot"] * 40) + [f"k{i}" for i in range(60)]
    for k in stream:
        _mg_fold(counters, k, 1, capacity=4)
    assert len(counters) <= 4
    assert "hot" in counters
    assert counters["hot"] >= 40 - len(stream) / 5


def test_heavy_hitters_sketch_exact_vs_groupby(spark):
    """Sketch output must EQUAL the exact HAVING query (no false positives
    or negatives after recount) on skewed data spread over partitions."""
    rows = [(i, "hot") for i in range(300)]
    rows += [(i, "warm") for i in range(150)]
    rows += [(i, f"cold{i % 97}") for i in range(150)]
    df = spark.createDataFrame(rows, "i long, k string").repartition(8)
    got = {(r.k, r.cnt) for r in heavy_hitters_sketch(df, "k", capacity=5).collect()}
    n = df.count()
    want = {
        (r.k, r.cnt)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > n / 5)
        .collect()
    }
    assert got == want and {"hot", "warm"} == {k for k, _ in got}


def test_mg_candidates_bounded_output(spark):
    """Per-partition summaries must emit <= capacity keys + 1 total row per
    partition — the bounded-collect property the 100 TB argument rests on."""
    df = spark.createDataFrame(
        [(i, f"k{i % 1000}") for i in range(5000)], "i long, k string"
    ).repartition(4)
    out = mg_partition_candidates(df, "k", capacity=10).collect()
    totals = [r for r in out if r.is_total]
    cands = [r for r in out if not r.is_total]
    assert sum(r.w for r in totals) == 5000
    assert len(cands) <= 4 * 10


def test_time_rollup_matches_separate_groupbys(spark):
    """One grouping-sets pass == the union of per-grain GROUP BYs."""
    import datetime

    base = datetime.datetime(2024, 3, 4, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=37 * i), "t%d" % (i % 2), float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, et string, v double")
    got = {
        (r.grain, r.bucket, r.et): (r.cnt, r.sum_val)
        for r in time_rollup(df, "ts", "v", keys=["et"]).collect()
    }
    want = {}
    for g in ("hour", "day", "week"):
        for r in (
            df.groupBy(F.date_trunc(g, "ts").alias("b"), "et")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                (F.round(F.sum("v"), 2) + F.lit(0.0)).alias("s"),
            )
            .collect()
        ):
            want[(g, r.b, r.et)] = (r.cnt, r.s)
    assert got == want
    assert len({k[0] for k in got}) == 3


def test_time_rollup_single_shuffle(spark, sf_dir):
    """The whole rollup must cost ONE Exchange (Expand + partial agg before
    it) — not one shuffle per grain."""
    from fireworks_spark.tables import table

    e = table(spark, sf_dir, "events")
    plan = (
        time_rollup(e, "ts", "value", keys=["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" in plan
