"""Second tranche of declared relational queries (Q70+): analytic windows
(lag/lead), CUBE grouping sets, exact percentiles, EXISTS/NOT EXISTS,
array explode, sample stddev, regex extraction, null handling — rounding
out the §2.3 pandas-passthrough surface (rolling/rank/lag-lead, describe-
style stats) that Q1-Q28 didn't touch. Same contract: identical aliases on
both sides, total ORDER BY, ROUND on floats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fireworks_spark.tables import table
from fireworks_spark.functions.time import epoch_micros


def q70_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytic window over each user's event stream."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.lag("value", 1).over(w), 2).alias("prev_val"),
            F.round(F.lead("value", 1).over(w), 2).alias("next_val"),
        )
        .orderBy("user_id", "event_id")
    )


def q71_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 4 grouping sets in one pass."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q72_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (pandas describe / quantile analog).
    Spark percentile() and DuckDB quantile_cont share the linear-
    interpolation definition."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


def q73_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (decorrelated by Catalyst to semi/anti
    joins — the declarative face of q07/q08)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000) AS has_big
        FROM customer c ORDER BY c_custkey
        """
    )


def q74_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (UDTF shape, §2.6): one row per token with its
    position."""
    p = table(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    return (
        p.select("p_partkey", F.posexplode(toks).alias("pos", "tok"))
        .select("p_partkey", F.col("pos").cast("long").alias("pos"), "tok")
        .orderBy("p_partkey", "pos")
    )


def q75_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance (describe-style stats)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd"),
            F.round(F.var_samp("l_quantity"), 2).alias("vq"),
        )
        .orderBy("l_returnflag")
    )


def q76_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction (.str.extract analog)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.regexp_extract("c_name", r"([0-9]+)", 1).alias("num_part"),
        )
        .orderBy("c_custkey")
    )


def q77_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / null-aware aggregation over the left-join shape."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return (
        j.select(
            "c_custkey",
            F.coalesce(F.round("o_totalprice", 2), F.lit(0.0)).alias("big_or_zero"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        )
        .orderBy("c_custkey", "big_or_zero")
    )


def q78_union_all_distinct_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with per-branch labels then distinct count per label."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k"), F.lit("cust").alias("src")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k"), F.lit("supp").alias("src")
    )
    return (
        c.unionAll(s)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("k").alias("nk"),
        )
        .orderBy("src")
    )


def q79_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch session windows (F.session_window — the same operator the
    streaming path uses) checked against a gap-and-islands SQL oracle.
    Spark merges an event into a session when its ts is strictly before
    the session end (last ts + gap), so the oracle breaks on diff >= gap."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def q80_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() marker (beyond rollup/cube)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
                 cnt, g_status
        """
    )


def q29_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it (operators/asof.py — union + per-key window, one shuffle).
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from fireworks_spark.operators.asof import asof_join

    e = table(spark, sf_dir, "events")
    l = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    r = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = asof_join(l, r, ["user_id"], "ts", ["value"])
    return j.select(
        "event_id",
        "user_id",
        (F.round("value_r", 2) + F.lit(0.0)).alias("click_val"),
        (epoch_micros("ts") - epoch_micros("ts_r")).alias("delta_us"),
    ).orderBy("event_id")


def q81_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks inside each user's post-signup hour
    (operators/interval.py — bucketized equi-join, no nested loop)."""
    from fireworks_spark.operators.interval import interval_join

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    j = interval_join(
        clicks, signups, "ts", "start_ts", "end_ts", keys=["user_id"]
    )
    return j.select("event_id", "signup_id", "user_id").orderBy(
        "event_id", "signup_id"
    )


def q91_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum of value — a RANGE frame over event
    TIME, not row count (the time-series smoothing shape). Spark's
    rangeBetween needs a numeric order key, so the frame runs over
    unix_micros(ts); bounds are inclusive on both engines."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("rolling_1h"),
        )
        .orderBy("user_id", "event_id")
    )


def q92_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentile (scale path for q72). Sketches are not
    hash-comparable across engines, so the declared check is the tolerance
    assertion itself: both sides emit within_tol=TRUE iff their approx p50
    is within 2%% of their exact p50."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        (
            F.abs(
                F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
                - F.expr("percentile(o_totalprice, 0.5)")
            )
            / F.expr("percentile(o_totalprice, 0.5)")
            < 0.02
        ).alias("within_tol")
    )


def q95_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join (toolbox.salted_join): events (big, skewed-key-
    tolerant side) joined to nation names through user_id % 25. The salt is
    internal plumbing — the result must equal the plain join, which is
    exactly what the oracle asserts."""
    from fireworks_spark.operators.toolbox import salted_join

    e = table(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 25).alias("n_nationkey")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        salted_join(e, n, "n_nationkey", salt=8)
        .select("event_id", "n_name")
        .orderBy("event_id")
    )


def q96_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (the CoGroupedMap Arrow shape): purchases
    and clicks cogrouped per user; each group pair runs pandas.merge_asof
    — the canonical cogroup use. Must equal the window-based as-of join
    (oracle: DuckDB native ASOF LEFT JOIN).

    Scoped to a 10%% user slice: every cogroup pays a per-group Python
    round-trip, so this query exists to pin the cogroup SEMANTICS — the
    scale path for as-of joins is q29's single-shuffle window formulation
    (operators/asof.py), which has no per-group Python cost."""
    import pandas as pd

    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    l = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # NOTE: both sides derive from the same scan, so same-named columns
    # carry the SAME attribute id — the cogroup plan deduplicates them and
    # the right pandas frame would silently lose its 'ts'. Fresh aliases
    # force distinct attributes.
    r = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # a key absent on one side arrives as an empty, column-less frame
        if len(left) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "value": pd.Series(dtype="float64")}
            )
        left = left.sort_values("ts")
        if len(right) == 0:
            out = left[["event_id", "user_id"]].copy()
            out["value"] = float("nan")
            return out
        right = (
            right[["r_ts", "r_value"]]
            .rename(columns={"r_ts": "ts", "r_value": "value"})
            .sort_values("ts")
        )
        m = pd.merge_asof(left, right, on="ts", direction="backward")
        return m[["event_id", "user_id", "value"]]

    out = (
        l.groupBy("user_id")
        .cogroup(r.groupBy("user_id"))
        .applyInPandas(merge, "event_id long, user_id long, value double")
    )
    return out.select(
        "event_id",
        "user_id",
        (F.round("value", 2) + F.lit(0.0)).alias("click_val"),
    ).orderBy("event_id")



def q111_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate backfill: hour/day/week
    rollups of event value per type in ONE grouping-sets pass
    (operators/timeagg.py — Expand + partial agg, a single bucket-bounded
    shuffle instead of three scans)."""
    from fireworks_spark.operators.timeagg import time_rollup

    e = table(spark, sf_dir, "events")
    return time_rollup(
        e, "ts", "value", grains=("hour", "day", "week"),
        keys=["event_type"],
    ).orderBy("grain", "bucket", "event_type")


def q160_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel view -> click -> purchase over the events
    table (timeagg.funnel_counts): per-step distinct-user reach with
    strictly-increasing timestamps and greedy earliest matching, computed
    in ONE shuffle by a per-user sorted-array fold. The oracle re-derives
    reach with an independent k-CTE iterative-min strategy (min qualifying
    ts per step, strictly after the previous step's), so the fold's greedy
    semantics are cross-checked, not just re-run."""
    from fireworks_spark.operators.timeagg import funnel_counts

    e = table(spark, sf_dir, "events")
    return funnel_counts(e, ["view", "click", "purchase"])


def q161_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over events (timeagg.retention_cohorts):
    users cohorted by the week of their first event; distinct-user counts
    per (cohort, week offset). Within-period duplicates collapse BEFORE
    the join, so the oracle's straightforward re-derivation doubles as a
    no-amplification check."""
    from fireworks_spark.operators.timeagg import retention_cohorts

    e = table(spark, sf_dir, "events")
    return retention_cohorts(e, "user_id", "ts", "week").withColumn(
        "cohort", F.col("cohort").cast("string")
    )


def q162_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user paths (timeagg.top_paths): each user's first 3 event
    types in (ts, type) order joined '>' and counted — the
    how-do-sessions-start view. Rank-limits to depth rows per user
    BEFORE grouping; path assembly is a sorted-struct fold, never an
    order-dependent collect_list."""
    from fireworks_spark.operators.timeagg import top_paths

    e = table(spark, sf_dir, "events")
    return top_paths(e, depth=3)


def q163_ab_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout (experiment.ab_metrics): users deterministically
    bucketed by user_id parity, per-event-type sample sizes, means, mean
    lift and Welch's t in ONE conditional-aggregation pass (no pivot).
    Floats follow rounding convention 1 (raw aggregates, F.round/ROUND)."""
    from fireworks_spark.experiment import ab_metrics

    e = table(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("user_id") % 2).cast("int")
    )
    return ab_metrics(e, "bucket", "value", group_col="event_type")


def q164_funnel_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel velocity (timeagg.funnel_gaps): p50/p90 seconds between
    consecutive matched steps of view->click->purchase, timestamps taken
    from the SAME greedy fold as q160's reach. Oracle re-derives the
    matched times with the independent iterative-min CTEs and aggregates
    with quantile_cont (the q72-established percentile parity)."""
    from fireworks_spark.operators.timeagg import funnel_gaps

    e = table(spark, sf_dir, "events")
    return funnel_gaps(e, ["view", "click", "purchase"])


RELATIONAL2_QUERIES = {
    "q164_funnel_gaps": q164_funnel_gaps,
    "q160_event_funnel": q160_event_funnel,
    "q161_retention_cohorts": q161_retention_cohorts,
    "q162_top_paths": q162_top_paths,
    "q163_ab_metrics": q163_ab_metrics,
    "q111_time_rollup": q111_time_rollup,
    "q91_rolling_time_window": q91_rolling_time_window,
    "q92_approx_percentile": q92_approx_percentile,
    "q95_salted_join": q95_salted_join,
    "q96_cogroup_asof": q96_cogroup_asof,
    "q29_asof_join": q29_asof_join,
    "q81_interval_join": q81_interval_join,
    "q79_session_windows": q79_session_windows,
    "q80_grouping_sets": q80_grouping_sets,
    "q70_lag_lead": q70_lag_lead,
    "q71_cube": q71_cube,
    "q72_percentile": q72_percentile,
    "q73_exists_subquery": q73_exists_subquery,
    "q74_explode_array": q74_explode_array,
    "q75_stddev": q75_stddev,
    "q76_regexp_extract": q76_regexp_extract,
    "q77_null_funcs": q77_null_funcs,
    "q78_union_all_distinct_mix": q78_union_all_distinct_mix,
}

RELATIONAL2_ORACLE = {
    "q160_event_funnel": """
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t
          GROUP BY e.user_id
        )
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
               COUNT(*) AS users FROM s1
        UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
        ORDER BY step
    """,
    "q161_retention_cohorts": """
        WITH f AS (
          SELECT user_id,
                 CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
          FROM events GROUP BY user_id
        ), a AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS p
          FROM events
        )
        SELECT CAST(f.cohort AS VARCHAR) AS cohort,
               CAST(datediff('day', f.cohort, a.p) / 7 AS BIGINT)
                 AS "offset",
               COUNT(*) AS users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort, "offset"
    """,
    "q162_top_paths": """
        WITH r AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_type) AS rn
          FROM events
        ), p AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY user_id
        )
        SELECT path, COUNT(*) AS users FROM p
        GROUP BY path ORDER BY users DESC, path
    """,
    "q163_ab_metrics": """
        WITH m AS (
          SELECT event_type,
                 COUNT(CASE WHEN user_id % 2 = 0 THEN value END) AS n_a,
                 COUNT(CASE WHEN user_id % 2 = 1 THEN value END) AS n_b,
                 AVG(CASE WHEN user_id % 2 = 0 THEN value END) AS ma,
                 AVG(CASE WHEN user_id % 2 = 1 THEN value END) AS mb,
                 VAR_SAMP(CASE WHEN user_id % 2 = 0 THEN value END) AS va,
                 VAR_SAMP(CASE WHEN user_id % 2 = 1 THEN value END) AS vb
          FROM events GROUP BY event_type
        )
        SELECT event_type, n_a, n_b,
               ROUND(ma, 4) AS mean_a, ROUND(mb, 4) AS mean_b,
               ROUND(mb - ma, 4) AS lift,
               ROUND((mb - ma) / sqrt(va / n_a + vb / n_b), 4) AS t_welch
        FROM m ORDER BY event_type
    """,
    "q164_funnel_gaps": """
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t
          GROUP BY e.user_id
        ), g2 AS (
          SELECT epoch(s2.t) - epoch(s1.t) AS gap
          FROM s2 JOIN s1 USING (user_id)
        ), g3 AS (
          SELECT epoch(s3.t) - epoch(s2.t) AS gap
          FROM s3 JOIN s2 USING (user_id)
        )
        SELECT CAST(2 AS BIGINT) AS step, 'view' AS from_step,
               'click' AS to_step, COUNT(*) AS n,
               ROUND(quantile_cont(gap, 0.5), 2) AS p50_s,
               ROUND(quantile_cont(gap, 0.9), 2) AS p90_s
        FROM g2
        UNION ALL
        SELECT 3, 'click', 'purchase', COUNT(*),
               ROUND(quantile_cont(gap, 0.5), 2),
               ROUND(quantile_cont(gap, 0.9), 2)
        FROM g3 ORDER BY step
    """,
    "q111_time_rollup": (
        "SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, "
        "event_type, count(*) AS cnt, round(sum(value), 2) AS sum_val "
        "FROM events GROUP BY 2, 3 "
        "UNION ALL "
        "SELECT 'day', date_trunc('day', ts), event_type, count(*), "
        "round(sum(value), 2) FROM events GROUP BY 2, 3 "
        "UNION ALL "
        "SELECT 'week', date_trunc('week', ts), event_type, count(*), "
        "round(sum(value), 2) FROM events GROUP BY 2, 3 "
        "ORDER BY grain, bucket, event_type"
    ),

    "q95_salted_join": (
        "SELECT event_id, n_name FROM events "
        "JOIN nation ON user_id % 25 = n_nationkey "
        "ORDER BY event_id"
    ),
    "q96_cogroup_asof": (
        "WITH l AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'purchase' AND user_id % 10 = 0), "
        "r AS (SELECT user_id, ts, value FROM events "
        "WHERE event_type = 'click' AND user_id % 10 = 0) "
        "SELECT l.event_id, l.user_id, "
        "ROUND(r.value, 2) + 0.0 AS click_val "
        "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts "
        "ORDER BY l.event_id"
    ),
    "q91_rolling_time_window": (
        "SELECT user_id, event_id, "
        "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2) "
        "+ 0.0 AS rolling_1h "
        "FROM events ORDER BY user_id, event_id"
    ),
    "q92_approx_percentile": (
        "SELECT ABS(approx_quantile(o_totalprice, 0.5) - "
        "quantile_cont(o_totalprice, 0.5)) / "
        "quantile_cont(o_totalprice, 0.5) < 0.02 AS within_tol FROM orders"
    ),
    "q29_asof_join": (
        "WITH l AS (SELECT event_id, user_id, ts, value FROM events "
        "WHERE event_type = 'purchase'), "
        "r AS (SELECT user_id, ts, value FROM events "
        "WHERE event_type = 'click') "
        "SELECT l.event_id, l.user_id, "
        "ROUND(r.value, 2) + 0.0 AS click_val, "
        "epoch_us(l.ts) - epoch_us(r.ts) AS delta_us "
        "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts "
        "ORDER BY l.event_id"
    ),
    "q81_interval_join": (
        "WITH c AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click'), "
        "s AS (SELECT event_id AS signup_id, user_id, ts AS start_ts, "
        "ts + INTERVAL 1 HOUR AS end_ts FROM events "
        "WHERE event_type = 'signup') "
        "SELECT c.event_id, s.signup_id, c.user_id FROM c JOIN s "
        "ON c.user_id = s.user_id AND c.ts >= s.start_ts AND c.ts < s.end_ts "
        "ORDER BY event_id, signup_id"
    ),
    "q79_session_windows": (
        "WITH d AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts) < INTERVAL 30 MINUTE THEN 0 "
        "ELSE 1 END AS brk FROM events), "
        "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM d) "
        "SELECT user_id, MIN(ts) AS session_start, "
        "MAX(ts) + INTERVAL 30 MINUTE AS session_end, "
        "COUNT(*) AS n_events FROM s GROUP BY user_id, sid "
        "ORDER BY user_id, session_start"
    ),
    "q80_grouping_sets": (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt, "
        "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, "
        "cnt, g_status"
    ),
    "q70_lag_lead": (
        "SELECT user_id, event_id, "
        "ROUND(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)"
        " AS prev_val, "
        "ROUND(LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)"
        " AS next_val "
        "FROM events ORDER BY user_id, event_id"
    ),
    "q71_cube": (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders "
        "GROUP BY CUBE (o_orderstatus, o_orderpriority) "
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
    ),
    "q72_percentile": (
        "SELECT o_orderstatus, "
        "ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50, "
        "ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90 "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
    "q73_exists_subquery": (
        "SELECT c_custkey, EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000) "
        "AS has_big FROM customer c ORDER BY c_custkey"
    ),
    "q74_explode_array": (
        "SELECT p_partkey, CAST(x.pos AS BIGINT) AS pos, x.tok FROM ("
        "SELECT p_partkey, unnest(list_transform(range(len(toks)), "
        "i -> struct_pack(pos := i, tok := toks[i+1]))) AS x FROM ("
        "SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)) "
        "ORDER BY p_partkey, pos"
    ),
    "q75_stddev": (
        "SELECT l_returnflag, "
        "ROUND(stddev_samp(l_extendedprice), 2) AS sd, "
        "ROUND(var_samp(l_quantity), 2) AS vq "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "q76_regexp_extract": (
        "SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS num_part "
        "FROM customer ORDER BY c_custkey"
    ),
    "q77_null_funcs": (
        "SELECT c_custkey, "
        "COALESCE(ROUND(o_totalprice, 2), 0.0) AS big_or_zero, "
        "NULLIF(c_mktsegment, 'BUILDING') AS seg_nb "
        "FROM customer c LEFT JOIN "
        "(SELECT * FROM orders WHERE o_totalprice > 450000) o "
        "ON c.c_custkey = o.o_custkey "
        "ORDER BY c_custkey, big_or_zero"
    ),
    "q78_union_all_distinct_mix": (
        "SELECT src, COUNT(*) AS n, COUNT(DISTINCT k) AS nk FROM ("
        "SELECT c_nationkey AS k, 'cust' AS src FROM customer "
        "UNION ALL SELECT s_nationkey AS k, 'supp' AS src FROM supplier) "
        "GROUP BY src ORDER BY src"
    ),
}
