"""Interval-join unit tests: containment boundaries, multi-bucket spans,
empty intervals, and pair uniqueness."""

from __future__ import annotations

from datetime import datetime

from fireworks_spark.operators.interval import interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_interval_join_boundaries_and_spans(spark):
    pts = spark.createDataFrame(
        [
            (1, "k", _ts("2024-01-01 10:00:00")),  # == start: included
            (2, "k", _ts("2024-01-01 11:00:00")),  # == end: excluded
            (3, "k", _ts("2024-01-01 10:59:59")),
            (4, "z", _ts("2024-01-01 10:30:00")),  # other key
        ],
        "id long, k string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (100, "k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (101, "k", _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:30:00")),  # empty
        ],
        "iid long, k string, lo timestamp, hi timestamp",
    )
    # bucket (5 min) much smaller than the interval: multi-bucket span
    out = interval_join(pts, iv, "ts", "lo", "hi", keys=["k"],
                        bucket_micros=300 * 10**6)
    pairs = sorted((r.id, r.iid) for r in out.collect())
    assert pairs == [(1, 100), (3, 100)]
