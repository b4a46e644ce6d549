"""As-of join unit tests: backward inclusive match, no-match nulls,
tolerance cutoff (pandas merge_asof semantics on inline fixtures)."""

from __future__ import annotations

from datetime import datetime

from fireworks_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00"), "L1"),
            (2, "k1", _ts("2024-01-01 12:00:00"), "L2"),
            (3, "k2", _ts("2024-01-01 09:00:00"), "L3"),  # before any right
        ],
        "id long, k string, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 10:00:00"), 10.0),  # equal ts: inclusive
            ("k1", _ts("2024-01-01 11:30:00"), 20.0),
            ("k2", _ts("2024-01-01 11:00:00"), 30.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        r.id: r.v_r
        for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None}


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 12:00:00"), "x")],
        "id long, k string, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 5.0)],
        "k string, ts timestamp, v double",
    )
    hit = asof_join(left, right, ["k"], "ts", ["v"]).collect()[0]
    assert hit.v_r == 5.0
    miss = asof_join(
        left, right, ["k"], "ts", ["v"], tolerance_micros=3600 * 10**6
    ).collect()[0]
    assert miss.v_r is None and miss.ts_r is None
