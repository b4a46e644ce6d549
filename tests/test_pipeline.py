"""Pipe facade: the reference's chaining surface delegates to the operator
library and stays lazy until an action."""

from __future__ import annotations

from pyspark.sql import functions as F

from fireworks_spark.pipeline import Pipe


def test_chain_repeat_shuffle_label(spark):
    base = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    p = Pipe(base).repeat(3).shuffle(seed=7).label("cats")
    assert p.count() == 30
    rows = p.collect()
    assert all(r.labels == "cats" for r in rows)
    # seeded shuffle is deterministic
    again = Pipe(base).repeat(3).shuffle(seed=7).label("cats").collect()
    assert [r.x for r in rows] == [r.x for r in again]


def test_split_and_projection(spark):
    base = spark.createDataFrame([(i, i * 2) for i in range(100)], ["k", "v"])
    train, test = Pipe(base).split("k", test_fraction=0.25)
    assert train.count() + test.count() == 100
    assert set(r.k for r in train.collect()).isdisjoint(
        r.k for r in test.collect()
    )
    only_v = Pipe(base)["v"]
    assert only_v.df.columns == ["v"]


def test_apply_and_batches(spark):
    base = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    p = Pipe(base).apply(lambda df: df.filter(F.col("x") < 6))
    got = list(p.batches(2))
    assert len(got) == 3 and all(len(b) == 2 for b in got)


def test_interleave_round_robin(spark):
    a = spark.createDataFrame([(1,), (3,)], ["x"])
    b = spark.createDataFrame([(2,), (4,)], ["x"])
    out = Pipe(a).interleave(b, order_cols=["x"])
    assert out.count() == 4
