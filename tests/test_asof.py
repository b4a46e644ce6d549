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


def test_asof_directions_match_pandas_merge_asof(spark):
    """All three directions checked against pandas.merge_asof on random
    per-key tick data (timestamps, no exact-tie collisions so the tie rule
    doesn't diverge from pandas' arbitrary pick)."""
    import datetime
    import random

    import pandas as pd

    from fireworks_spark.operators.asof import asof_join

    rng = random.Random(11)
    base = datetime.datetime(2024, 5, 1)
    # distinct odd-second lefts and even-second rights: no ties anywhere
    lrows = sorted(
        (k, base + datetime.timedelta(seconds=2 * rng.randrange(5000) + 1))
        for k in range(4)
        for _ in range(40)
    )
    lrows = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    rrows = list(
        {
            (k, base + datetime.timedelta(seconds=2 * rng.randrange(5000)))
            for k in range(4)
            for _ in range(60)
        }
    )
    rrows = [(k, t, float(k * 100000 + i)) for i, (k, t) in enumerate(sorted(rrows))]

    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "k long, ts timestamp, px double")
    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "px"]).sort_values("ts")

    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: r.px_r
            for r in asof_join(
                ldf, rdf, ["k"], "ts", ["px"], direction=direction
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction
        )
        want = {
            int(r.lid): (None if pd.isna(r.px) else float(r.px))
            for r in want_df.itertuples()
        }
        assert got == want, direction

    # tolerance: 1000s window, backward and forward
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.px_r
            for r in asof_join(
                ldf, rdf, ["k"], "ts", ["px"],
                direction=direction, tolerance_micros=1000 * 10**6,
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction,
            tolerance=pd.Timedelta(seconds=1000),
        )
        want = {
            int(r.lid): (None if pd.isna(r.px) else float(r.px))
            for r in want_df.itertuples()
        }
        assert got == want, f"{direction}+tolerance"


def test_asof_nearest_single_shuffle(spark):
    """nearest computes both direction carries over one hash partitioning:
    exactly ONE Exchange in the plan, two sorts."""
    from fireworks_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([(1, 1.0)], "k long, ts double").selectExpr(
        "k", "timestamp_seconds(ts) as ts"
    )
    rdf = spark.createDataFrame([(1, 0.5, 9.0)], "k long, ts double, px double").selectExpr(
        "k", "timestamp_seconds(ts) as ts", "px"
    )
    plan = (
        asof_join(ldf, rdf, ["k"], "ts", ["px"], direction="nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_null_payload_stays_whole_row(spark):
    """A NULL in one right payload column must NOT fall through to an older
    right row: the match is always one intact right row (pandas merge_asof
    row semantics). Regression for the per-column last(ignorenulls) carry."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 12:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), 1.0, "old"),
            # newest right before left.ts has a NULL in a:
            ("k", _ts("2024-01-01 11:00:00"), None, "new"),
        ],
        "k string, ts timestamp, a double, b string",
    )
    for direction in ("backward", "nearest"):
        row = asof_join(
            left, right, ["k"], "ts", ["a", "b"], direction=direction
        ).collect()[0]
        assert row.b_r == "new" and row.a_r is None, direction
        assert row.ts_r == _ts("2024-01-01 11:00:00"), direction
    # forward: the only right at/after left.ts is... none; all NULL
    fwd = asof_join(
        left, right, ["k"], "ts", ["a", "b"], direction="forward"
    ).collect()[0]
    assert fwd.a_r is None and fwd.b_r is None and fwd.ts_r is None
