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
    totals = [r for r in out if r.kind == "total"]
    cands = [r for r in out if r.kind == "cand"]
    assert sum(r.w for r in totals) == 5000
    assert len(cands) <= 4 * 10


def test_heavy_hitters_null_key_group(spark):
    """A NULL key heavy enough to pass the threshold must appear in the
    output with its EXACT count (the oracle's GROUP BY includes the NULL
    group; the semi-join recount alone would silently drop it), and NULL
    keys must never enter the MG counters of a non-float key column."""
    rows = [(i, "hot") for i in range(300)]
    rows += [(i, None) for i in range(200)]
    rows += [(i, f"cold{i % 97}") for i in range(100)]
    df = spark.createDataFrame(rows, "i long, k string").repartition(8)
    got = {r.k: r.cnt for r in heavy_hitters_sketch(df, "k", capacity=5).collect()}
    assert got == {"hot": 300, None: 200}
    # same shape with a LONG key column: NaN would break the Arrow schema
    dfl = spark.createDataFrame(
        [(i, 7) for i in range(300)] + [(i, None) for i in range(200)],
        "i long, k long",
    ).repartition(8)
    gotl = {r.k: r.cnt for r in heavy_hitters_sketch(dfl, "k", capacity=5).collect()}
    assert gotl == {7: 300, None: 200}


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


def test_sketch_recount_uses_broadcast_join(spark, sf_dir):
    """Pass 2 must recount via a BROADCAST semi-join on the bounded
    candidate set — never a shuffle of the corpus keyed by candidate."""
    from fireworks_spark.tables import table

    e = table(spark, sf_dir, "events")
    plan = (
        heavy_hitters_sketch(e, "user_id", capacity=120)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_mg_fold_property_guarantee():
    """Property: for random weighted streams, every counter's residual
    undercounts its true frequency by at most total/(capacity+1), and any
    key above that bound survives — the two Misra-Gries invariants."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(1, 20)),
            min_size=1,
            max_size=300,
        ),
        st.integers(2, 8),
    )
    def check(stream, capacity):
        true: dict = {}
        counters: dict = {}
        for k, w in stream:
            true[k] = true.get(k, 0) + w
            _mg_fold(counters, k, w, capacity)
        total = sum(w for _, w in stream)
        bound = total / (capacity + 1)
        assert len(counters) <= capacity
        for k, c in counters.items():
            assert c <= true[k]
            assert true[k] - c <= bound
        for k, t in true.items():
            if t > bound:
                assert k in counters

    check()


def test_rebalance_strata_equalizes(spark):
    """Skewed strata (10:3:1) must come out within one threshold step of
    the smallest stratum, deterministically."""
    from fireworks_spark.operators.toolbox import rebalance_strata

    # keys uniform mod 10000 (multipliers coprime to the denom) — the
    # documented contract of keyed mod sampling
    rows = [(13 * i, "big") for i in range(5000)]
    rows += [(1_000_000 + 37 * i, "mid") for i in range(1500)]
    rows += [(5_000_000 + 101 * i, "small") for i in range(500)]
    df = spark.createDataFrame(rows, "k long, s string")
    out1 = rebalance_strata(df, "s", "k")
    counts = {r.s: r.c for r in out1.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert counts["small"] == 500
    for s in ("big", "mid"):
        # keyed mod sampling is approximate (lattice effects of the
        # key progression); 12% is the honest local tolerance
        assert abs(counts[s] - 500) <= 0.12 * 500 + 10
    # deterministic: same kept set on a second evaluation
    got1 = sorted(r.k for r in out1.collect())
    got2 = sorted(r.k for r in rebalance_strata(df, "s", "k").collect())
    assert got1 == got2


def test_funnel_counts_closed_form(spark):
    """Hand funnel A -> B -> C: ordered strictly-increasing matching,
    greedy earliest occurrence, same-timestamp events never advance,
    out-of-order prefixes don't count."""
    import datetime as dt

    from fireworks_spark.operators.timeagg import funnel_counts

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 completes A(1) B(2) C(3)
        (1, t(1), "A"), (1, t(2), "B"), (1, t(3), "C"),
        # u2: B before A; then A(5) B(6) -> reaches 2, no C
        (2, t(4), "B"), (2, t(5), "A"), (2, t(6), "B"),
        # u3: A and B at the SAME ts -> strict > blocks B; reach 1
        (3, t(7), "A"), (3, t(7), "B"),
        # u4: only C -> reach 0 (no row contribution)
        (4, t(8), "C"),
        # u5: A(9) C(10) B(11) C(12) -> A,B,C in order via later C
        (5, t(9), "A"), (5, t(10), "C"), (5, t(11), "B"), (5, t(12), "C"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: (r.step_name, r.users)
        for r in funnel_counts(df, ["A", "B", "C"]).collect()
    }
    assert got == {1: ("A", 4), 2: ("B", 3), 3: ("C", 2)}


def test_retention_cohorts_closed_form(spark):
    """Two weekly cohorts with hand-placed activity: offset 0 equals
    cohort size, within-period duplicates never double-count, later
    activity lands at the right offset."""
    import datetime as dt

    from fireworks_spark.operators.timeagg import retention_cohorts

    # 2024-01-01 is a Monday (week start)
    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        # cohort W0 (Jan 1): users 1, 2
        (1, d(1)), (1, d(2)), (1, d(9)),   # active W0 (x2 -> counts once), W1
        (2, d(3)), (2, d(17)),             # active W0, W2
        # cohort W1 (Jan 8): user 3
        (3, d(10)), (3, d(16)),            # active W1, W2 (offset 1)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.offset): r.users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_top_paths_closed_form(spark):
    """First-3 event-type paths per user, counted: ts order, same-ts ties
    break on the type string, short histories yield short paths."""
    import datetime as dt

    from fireworks_spark.operators.timeagg import top_paths

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "buy"),
        (2, t(1), "view"), (2, t(2), "click"), (2, t(3), "buy"),
        (3, t(1), "view"), (3, t(2), "buy"),
        # same-ts tie: 'click' sorts before 'view'
        (4, t(5), "view"), (4, t(5), "click"), (4, t(6), "buy"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = [(r.path, r.users) for r in top_paths(df, depth=3).collect()]
    assert got == [
        ("view>click>buy", 2),
        ("click>view>buy", 1),
        ("view>buy", 1),
    ]


def test_funnel_counts_matches_python_reference(spark):
    """Differential check of the funnel fold against a plain Python
    greedy-earliest reference over random event streams (duplicate
    timestamps, repeated types, partial reach)."""
    import datetime as dt
    import random

    from fireworks_spark.operators.timeagg import funnel_counts

    rng = random.Random(23)
    steps = ["A", "B", "C"]
    types = ["A", "B", "C", "X"]
    rows = []
    for u in range(60):
        for _ in range(rng.randrange(0, 12)):
            rows.append(
                (
                    u,
                    dt.datetime(2024, 1, 1, 0, 0, rng.randrange(0, 30)),
                    rng.choice(types),
                )
            )
    if not rows:
        rows = [(0, dt.datetime(2024, 1, 1), "A")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.step: r.users for r in funnel_counts(df, steps).collect()
    }

    # reference: iterative earliest-qualifying-min per step (the q160
    # oracle's strategy, in Python)
    want = {i + 1: 0 for i in range(len(steps))}
    by_user: dict = {}
    for u, ts, y in rows:
        by_user.setdefault(u, []).append((ts, y))
    for evs in by_user.values():
        last = None
        reach = 0
        for s in steps:
            cand = [
                ts
                for ts, y in evs
                if y == s and (last is None or ts > last)
            ]
            if not cand:
                break
            last = min(cand)
            reach += 1
        for i in range(reach):
            want[i + 1] += 1
    assert got == want


def test_funnel_gaps_closed_form(spark):
    """Step gaps from the same greedy matching as funnel_counts: u1
    A(1)->B(3)->C(6) gives gaps 2 and 3; u2 reaches only B with gap 10;
    u3 never converts (no contribution)."""
    import datetime as dt

    from fireworks_spark.operators.timeagg import funnel_gaps

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), "A"), (1, t(3), "B"), (1, t(6), "C"),
        (2, t(0), "A"), (2, t(10), "B"),
        (3, t(2), "B"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: (r.from_step, r.to_step, r.n, r.p50_s, r.p90_s)
        for r in funnel_gaps(df, ["A", "B", "C"]).collect()
    }
    # A->B gaps: [2.0, 10.0] -> p50 6.0 (interpolated), p90 9.2
    assert got[2][:3] == ("A", "B", 2)
    assert got[2][3] == 6.0
    assert abs(got[2][4] - 9.2) < 1e-9
    # B->C gaps: [3.0]
    assert got[3] == ("B", "C", 1, 3.0, 3.0)


def test_retention_cohorts_month_period(spark):
    """Calendar-month offsets via months_between: Jan 31 -> Feb 1 is
    offset 1 (a fixed 30/31-day divisor cannot express this), Jan -> Mar
    is offset 2; an unknown period raises up front."""
    import datetime as dt

    import pytest

    from fireworks_spark.operators.timeagg import retention_cohorts

    rows = [
        (1, dt.datetime(2024, 1, 31)),
        (1, dt.datetime(2024, 2, 1)),
        (1, dt.datetime(2024, 3, 15)),
        (2, dt.datetime(2024, 2, 10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.offset): r.users
        for r in retention_cohorts(df, period="month").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-02-01", 0): 1,
    }
    with pytest.raises(ValueError, match="unknown retention period"):
        retention_cohorts(df, period="fortnight")


def _funnel_reach(spark, rows, steps, **kw):
    from fireworks_spark.operators.timeagg import funnel_counts

    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    return {r.step: r.users for r in funnel_counts(df, steps, **kw).collect()}


def test_funnel_guard_is_exact_when_nothing_truncates(spark):
    """max_events_per_key large enough never changes the answer: the
    run-collapse is reach-neutral by construction (only events that can
    never be greedy-matched are dropped) and the cap bites nothing.
    Randomized differential guard-vs-exact, including ts ties."""
    import datetime as dt
    import random

    rng = random.Random(7)
    types = ["A", "B", "C", "X"]
    rows = []
    for u in range(40):
        for _ in range(rng.randrange(0, 30)):
            # coarse second grid forces same-user ts collisions
            rows.append(
                (u, dt.datetime(2024, 1, 1, 0, 0, rng.randrange(0, 20)),
                 rng.choice(types))
            )
    steps = ["A", "B", "C"]
    exact = _funnel_reach(spark, rows, steps)
    guarded = _funnel_reach(spark, rows, steps, max_events_per_key=1000)
    assert guarded == exact


def test_funnel_guard_collapses_bot_runs_exactly(spark):
    """A bot key with a huge same-type run: the run-collapse keeps only
    run heads, and the reach (and gaps) stay EXACT — the matched events
    themselves are always run heads."""
    import datetime as dt

    from fireworks_spark.operators.timeagg import funnel_gaps

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [(1, t(i), "A") for i in range(500)]  # bot run: 500 A's
    rows += [(1, t(600), "B"), (1, t(700), "C")]
    rows += [(2, t(0), "A"), (2, t(5), "B")]
    steps = ["A", "B", "C"]
    exact = _funnel_reach(spark, rows, steps)
    # cap=2 < the 500-event run, but the collapse fires first: per type
    # only run heads remain (A: 1 head for user 1), so nothing truncates
    guarded = _funnel_reach(spark, rows, steps, max_events_per_key=2)
    assert guarded == exact == {1: 2, 2: 2, 3: 1}
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    g_exact = [tuple(r) for r in funnel_gaps(df, steps).collect()]
    g_guard = [
        tuple(r)
        for r in funnel_gaps(df, steps, max_events_per_key=2).collect()
    ]
    assert g_guard == g_exact  # matched ts (hence gaps) survive collapse


def test_funnel_guard_truncation_is_a_lower_bound(spark):
    """The documented approximation: when the cap truncates surviving
    events, reach can only DROP (greedy reach is monotone under adding
    events) — and no first-N cap can be exact in general, even at
    N == len(steps): interleaved A/C runs make the matched C the 4th
    surviving C, past the cap."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        (1, t(0), "A"), (1, t(1), "C"), (1, t(2), "A"), (1, t(3), "C"),
        (1, t(4), "A"), (1, t(5), "C"), (1, t(6), "B"), (1, t(7), "C"),
    ]
    steps = ["A", "B", "C"]
    exact = _funnel_reach(spark, rows, steps)
    assert exact == {1: 1, 2: 1, 3: 1}
    # every event survives the collapse (all are run heads), so the
    # cap=3 == len(steps) drops C@7 — the actual match for step 3
    capped = _funnel_reach(spark, rows, steps, max_events_per_key=3)
    assert capped == {1: 1, 2: 1, 3: 0}
    for st in (1, 2, 3):
        assert capped[st] <= exact[st]


def test_funnel_guard_keeps_tie_boundary_events(spark):
    """Tie conservativeness: when a different-type event shares the ts of
    the previous same-type event, the follower must be KEPT (it can be
    the greedy match)."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731
    # sorted order: (t1,A), (t1,B), (t3,B) — B@3 follows B@1 (same type)
    # but A@1 ties with B@1; exact match: A@1 then B@3 (needs ts > 1)
    rows = [(1, t(1), "A"), (1, t(1), "B"), (1, t(3), "B")]
    steps = ["A", "B"]
    exact = _funnel_reach(spark, rows, steps)
    guarded = _funnel_reach(spark, rows, steps, max_events_per_key=10)
    assert guarded == exact == {1: 1, 2: 1}
