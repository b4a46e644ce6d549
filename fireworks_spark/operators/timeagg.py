"""Time/event analytics: hypertable-style multi-granularity rollup plus
the product-analytics staples (ordered funnels, cohort retention, top
paths). The reference has no time layer at all (its pipes are positional,
reference fireworks/toolbox/pipes.py:48-63); this is the Spark-first
expression of what a time-series / product-analytics store maintains.

Scale: ONE pass over the input. GROUPING SETS plans as Expand (xG rows,
map-side, inside codegen) -> partial HashAggregate -> one Exchange keyed by
(grain, bucket, keys) -> final HashAggregate. The shuffle carries at most
G x |buckets| x |keys| partially-aggregated rows — bucket cardinality, not
event cardinality — so 100 TB of events shuffles megabytes. Maintaining
the same result incrementally is tumbling_agg (streaming.py); this is the
batch/backfill face.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_rollup", "funnel_counts", "retention_cohorts", "top_paths", "funnel_gaps"]

_GRAINS = ("hour", "day", "week", "month", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "week"),
    keys: list[str] | None = None,
    round_to: int = 2,
) -> DataFrame:
    """Aggregate ``value_col`` (count + sum) at every granularity in
    ``grains`` in one grouping-sets pass.

    Output: (grain, bucket, *keys, cnt, sum_val) — one row per (grain,
    truncated bucket, keys), i.e. the union of G independent GROUP BYs
    without G scans of the input.
    """
    for g in grains:
        if g not in _GRAINS:
            raise ValueError(f"unknown grain {g!r}; pick from {_GRAINS}")
    keys = keys or []
    bucket_cols = [f"_b_{g}" for g in grains]
    with_buckets = df
    for g, bc in zip(grains, bucket_cols):
        with_buckets = with_buckets.withColumn(
            bc, F.date_trunc(g, F.col(ts_col))
        )
    sets = [[F.col(bc), *[F.col(k) for k in keys]] for bc in bucket_cols]
    # grouping() flags are only legal inside the grouping-sets aggregate,
    # so materialize them as aggregate outputs and derive grain afterwards
    agg = with_buckets.groupingSets(
        sets, *[F.col(bc) for bc in bucket_cols], *[F.col(k) for k in keys]
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.round(F.sum(value_col), round_to) + F.lit(0.0)).alias("sum_val"),
        *[F.grouping(bc).alias(f"_g_{g}") for g, bc in zip(grains, bucket_cols)],
    )
    # exactly one bucket column is grouped per set; grain = which one
    grain = F.lit(None).cast("string")
    for g in grains:
        grain = F.when(F.col(f"_g_{g}") == 0, F.lit(g)).otherwise(grain)
    return agg.select(
        grain.alias("grain"),
        F.coalesce(*bucket_cols).alias("bucket"),
        *keys,
        "cnt",
        "sum_val",
    )


def _funnel_event_arrays(
    df: DataFrame,
    steps: list[str],
    key_col: str,
    ts_col: str,
    type_col: str,
    max_events_per_key: int | None,
) -> DataFrame:
    """Shared funnel pre-pass: filter to the funnel's own types and fold
    each key's events into one sorted (t, y) array — the input of the
    greedy fold in funnel_counts / funnel_gaps.

    ``max_events_per_key`` is the HEAVY-KEY GUARD (off by default = exact,
    zero extra cost). When set, two bounds apply before the fold, both
    computed inside ONE window over the same key partitioning the groupBy
    needs (no extra shuffle, one sort):

    1. EXACT run-collapse (only when the step types are distinct): an
       event can only ever be greedy-matched if it is the first of its
       type at/after some different-type event — greedy thresholds are
       matched different-type event times, and "first of type y after
       threshold t" always lands on such an event. Dropping the rest is
       therefore reach- and gap-neutral; ties are kept conservatively
       (other-type ts == previous same-type ts keeps the event). The
       classic bot key (millions of identical page-views in a row)
       collapses to its type-alternation count.
    2. Per-(key, type) cap at ``max_events_per_key`` surviving events (in
       ts order). EXACT whenever no (key, type) pair exceeds the cap
       after the collapse; a truncated key yields a LOWER BOUND on reach
       — greedy reach is the longest ordered sub-match, monotone under
       adding events. NOTE: no first-N cap can be exact in general (a
       late first step can force an arbitrarily late occurrence of the
       next type to be the match), so size the cap for the keys you are
       willing to under-count: bots. Real keys need cap >= the count of
       each type among their collapsed events.
    """
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(type_col).alias("_y"),
    )
    if max_events_per_key is not None:
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_y")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        uniq = sorted(set(steps))
        prev_max = {
            s: F.max(F.when(F.col("_y") == s, F.col("_t"))).over(w)
            for s in uniq
        }
        own = F.lit(None).cast("timestamp")
        for s in uniq:
            own = F.when(F.col("_y") == s, prev_max[s]).otherwise(own)
        if len(uniq) == len(steps) and len(uniq) > 1:
            # greatest skips NULLs, so masking out the row's own type
            # leaves the latest different-type predecessor ts
            other = F.greatest(
                *[F.when(F.col("_y") != s, prev_max[s]) for s in uniq]
            )
            keep = own.isNull() | (other >= own)
        elif len(uniq) == 1:
            # single step type: the per-(key, type) cap keeps each key's
            # EARLIEST events (row_number over _t), and a 1-step funnel's
            # reach needs only the first event per key — any cap >= 1 is
            # exact, no collapse and no warning needed
            keep = F.lit(True)
        else:
            # repeated step types in a multi-step funnel: the run-collapse
            # is unsafe, so the per-(key, type) cap below is the ONLY
            # bound — and without the collapse pre-shrinking heavy keys it
            # can truncate ordinary keys too, silently turning reach into
            # a lower bound. Say so where the user can see it.
            import warnings

            warnings.warn(
                "funnel: max_events_per_key is set but the funnel has "
                "repeated step types, so the exact run-collapse is "
                "skipped and the per-(key, type) cap may truncate "
                "ordinary (non-bot) keys — reach becomes a lower bound "
                "for any key with more than max_events_per_key events "
                "of one type. Either drop the cap or make the step "
                "types distinct.",
                stacklevel=3,
            )
            keep = F.lit(True)  # repeated step types: collapse is unsafe
        ev = ev.withColumn("_keep", keep).filter(F.col("_keep"))
        w2 = Window.partitionBy("_k", "_y").orderBy("_t")
        ev = (
            ev.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= max_events_per_key)
            .drop("_keep", "_rn")
        )
    return ev.select(
        "_k", F.struct(F.col("_t").alias("t"), F.col("_y").alias("y")).alias("_e")
    ).groupBy("_k").agg(F.array_sort(F.collect_list("_e")).alias("_es"))


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Ordered funnel reach (the product-analytics staple): for each step
    i, how many distinct keys performed steps[0..i] in order with STRICTLY
    increasing timestamps (greedy earliest matching — taking each step's
    first qualifying occurrence, which maximizes downstream reach, the
    standard funnel semantics). Returns (step, step_name, users) with
    step 1-based.

    ONE shuffle: events are pre-filtered to the funnel's own types, then
    each key's (ts, type) pairs collapse into a sorted array whose
    run-through fold advances a (reached, last_ts) state — no k-level
    self-join chain, no fan-out. ``max_events_per_key`` bounds the
    per-key array against heavy keys (bots): an EXACT same-type
    run-collapse plus a per-(key, type) cap — see
    :func:`_funnel_event_arrays` for the exactness contract. q160's
    oracle re-derives reach with an INDEPENDENT k-CTE iterative-min
    strategy, cross-checking the fold."""
    k = len(steps)
    per_key = _funnel_event_arrays(
        df, steps, key_col, ts_col, type_col, max_events_per_key
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    reached = F.aggregate(
        "_es",
        F.struct(
            F.lit(0).alias("r"),
            F.lit(None).cast("timestamp").alias("lt"),
        ),
        lambda acc, e: F.when(
            (acc.r < k)
            & (e.y == F.element_at(step_arr, acc.r + 1))
            & (acc.lt.isNull() | (e.t > acc.lt)),
            F.struct((acc.r + 1).alias("r"), e.t.alias("lt")),
        ).otherwise(acc),
        lambda acc: acc.r,
    )
    levels = (
        per_key.select(reached.alias("reached"))
        .groupBy("reached")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    steps_df = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step long, step_name string",
    )
    return (
        steps_df.join(levels, F.col("reached") >= F.col("step"), "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("users"))
        .orderBy("step")
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix (the product-analytics sibling of
    funnel_counts): keys are cohorted by the ``period``-truncated
    timestamp of their FIRST event; for every (cohort, offset) the count
    of distinct keys active ``offset`` periods after their cohort start.
    Returns (cohort date, offset long, users long); offset 0 is the
    cohort's own size.

    Two aggregations and one equi-join on the key — the first-seen table
    is one row per key and joins distributed (no broadcast assumption at
    100 TB); activity collapses to distinct (key, period) BEFORE the join
    so a key's duplicate events within a period never amplify it.

    ``period``: day/week offsets are day-difference quotients; month/year
    offsets use months_between (a fixed day divisor cannot express
    calendar months). Anything else raises up front."""
    if period not in ("day", "week", "month", "year"):
        raise ValueError(
            f"unknown retention period {period!r}; "
            "pick from ('day', 'week', 'month', 'year')"
        )
    trunc = F.date_trunc(period, F.col(ts_col))
    first = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.min(trunc).cast("date").alias("_cohort")
    )
    active = (
        df.select(
            F.col(key_col).alias("_k"), trunc.cast("date").alias("_p")
        )
        .distinct()
    )
    if period in ("month", "year"):
        # truncated bucket starts are exact month boundaries, so
        # months_between is integral by construction
        months = F.months_between("_p", "_cohort")
        offset = (
            (months / (12 if period == "year" else 1))
            .cast("long")
            .alias("offset")
        )
    else:
        days = {"day": 1, "week": 7}[period]
        offset = (
            (F.datediff("_p", "_cohort") / days).cast("long").alias("offset")
        )
    return (
        active.join(first, "_k")
        .select("_k", "_cohort", offset)
        .groupBy(F.col("_cohort").alias("cohort"), "offset")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("cohort", "offset")
    )


def top_paths(
    df: DataFrame,
    depth: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    sep: str = ">",
) -> DataFrame:
    """Top user paths (sequence-mining lite): each key's FIRST ``depth``
    event types in (ts, type) order joined with ``sep``, counted across
    keys. Returns (path, users) — the "how do sessions start" view next
    to funnel_counts (which asks about one fixed order) and
    retention_cohorts.

    One window rank + one per-key aggregation: the rank keeps only
    ``depth`` rows per key before anything groups, so the shuffle carries
    at most depth x |keys| narrow rows; path assembly is a sorted-struct
    fold, never an ordered collect_list (whose order is
    partition-dependent). Ties at equal ts break on the type string for
    determinism."""
    firsts = (
        df.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).alias("_t"),
            F.col(type_col).alias("_y"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_k").orderBy("_t", "_y")
            ),
        )
        .filter(F.col("_rn") <= depth)
    )
    paths = firsts.groupBy("_k").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_rn", "_y"))
                ),
                lambda s: s._y,
            ),
            sep,
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy(F.desc("users"), "path")
    )


def funnel_gaps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Funnel velocity: for each consecutive step pair, exact p50/p90 of
    the seconds between the two matched events across keys that reached
    the later step — the how-fast companion of funnel_counts' how-many.
    Matching is the SAME greedy earliest fold (the matched timestamps are
    accumulated in the fold state), so reach here always agrees with
    funnel_counts. Returns (step, from_step, to_step, n, p50_s, p90_s).

    Same one-shuffle shape as funnel_counts, same heavy-key guard
    (``max_events_per_key``, see :func:`_funnel_event_arrays` — the
    run-collapse preserves the matched events themselves, so gaps are
    unchanged, not just reach); the percentile aggregation adds one more
    bounded-key exchange (step pairs x quantiles)."""
    k = len(steps)
    per_key = _funnel_event_arrays(
        df, steps, key_col, ts_col, type_col, max_events_per_key
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    # last matched ts carried as a scalar (NULL before the first match):
    # under ANSI mode (the Spark 4 default) element_at(mt, -1) on an empty
    # array THROWS rather than returning NULL, so the guard must never
    # index the array — same acc.lt.isNull() shape as funnel_counts
    matched = F.aggregate(
        "_es",
        F.struct(
            F.lit(0).alias("r"),
            F.lit(None).cast("timestamp").alias("lt"),
            F.array().cast("array<timestamp>").alias("mt"),
        ),
        lambda acc, e: F.when(
            (acc.r < k)
            & (e.y == F.element_at(step_arr, acc.r + 1))
            & (acc.lt.isNull() | (e.t > acc.lt)),
            F.struct(
                (acc.r + 1).alias("r"),
                e.t.alias("lt"),
                F.concat(acc.mt, F.array(e.t)).alias("mt"),
            ),
        ).otherwise(acc),
        lambda acc: acc.mt,
    )
    ts_rows = per_key.select(matched.alias("mt")).select(
        F.posexplode(
            F.when(
                F.size("mt") >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.size("mt")),
                    lambda i: (
                        F.element_at("mt", i).cast("double")
                        - F.element_at("mt", i - 1).cast("double")
                    ),
                ),
            ).otherwise(F.array().cast("array<double>"))
        ).alias("pos", "gap_s")
    )
    pairs = df.sparkSession.createDataFrame(
        [(i + 2, steps[i], steps[i + 1]) for i in range(k - 1)],
        "step long, from_step string, to_step string",
    )
    agg = (
        ts_rows.select((F.col("pos") + 2).cast("long").alias("step"), "gap_s")
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 2).alias("p50_s"),
            F.round(F.expr("percentile(gap_s, 0.9)"), 2).alias("p90_s"),
        )
    )
    return (
        pairs.join(agg, "step", "left")
        .select(
            "step",
            "from_step",
            "to_step",
            F.coalesce("n", F.lit(0)).alias("n"),
            "p50_s",
            "p90_s",
        )
        .orderBy("step")
    )
