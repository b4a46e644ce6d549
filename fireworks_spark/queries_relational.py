"""Declared relational queries Q1-Q28 (SURVEY.md §2.4).

These exercise the capability surface the reference exposes through its
pandas passthrough (reference fireworks/core/message.py:548-558 — "All of the
existing df methods can be run on the metadata") and the SQLAlchemy layer
(reference fireworks/extensions/database.py:84-112 column pruning,
database.py:255-263 predicate pushdown).

Every builder takes ``(spark, sf_dir)`` and returns a DataFrame; ORACLE holds
the equivalent DuckDB SQL. Computed columns are aliased identically on both
sides (driver hash-compares values under sorted column names).

Determinism discipline (SURVEY.md §7.2): float aggregates are ROUND(x, 2),
every query carries a total ORDER BY, session timezone is UTC.

Scale notes are inline: each builder states why the plan survives 100 TB
(broadcast of dims, partial aggregation, top-k via TakeOrderedAndProject...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fireworks_spark.tables import table


# --------------------------------------------------------------------------
# Q1-Q8: scans, filters, joins
# --------------------------------------------------------------------------


def q01_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + projection (D3/P4). Column pruning reaches the parquet reader:
    ReadSchema carries only c_custkey, c_name."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with BETWEEN / IN (D4). Both predicates push into the parquet
    scan (PushedFilters: GreaterThanOrEqual, LessThanOrEqual, In)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity").between(10, 20))
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q03_constant_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant label column (P7 Title2LabelPipe, reference
    fireworks/toolbox/pipes.py:347-372) == withColumn(lit)."""
    return (
        table(spark, sf_dir, "region")
        .select("r_regionkey", "r_name", F.lit("region").alias("labels"))
        .orderBy("r_regionkey")
    )


def q04_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. customer is small relative to orders at every SF →
    broadcast hint; at 100 TB orders streams past a broadcast customer dim
    (or AQE picks SMJ if customer outgrows the threshold)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


def q05_multiway_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join + group-agg (flagship). lineitem (the fact) never shuffles
    for the joins: orders⋈customer⋈nation are all broadcast to it; the only
    shuffle is the 25-group final aggregation after map-side partial agg."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q06_left_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COUNT over nullable side (customers with 0 orders
    must appear with cnt=0 — FIXTURES.md guarantees such customers)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
        .orderBy(F.desc("cnt"), "c_custkey")
    )


def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (IN-subquery form in the oracle). Spark plans a
    broadcast/shuffled hash semi-join — no row duplication, no distinct."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT IN with non-null keys; D7 delete-semantics —
    reference fireworks/extensions/database.py:114-116 DELETE WHERE IN)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q9-Q12: aggregation
# --------------------------------------------------------------------------


def q09_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure hash aggregation (P21 stats pattern). Partial (map-side)
    agg + 6-group final agg: the shuffle moves O(groups), not O(rows)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q10_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (§2.3 drop_duplicates). Spark expands to a
    two-stage partial-distinct plan automatically."""
    o = table(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("cd"))


def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — one pass with grouping-set expansion."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q12_mean_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group mean/population variance — the batch form of the reference's
    streaming Normalizer (fireworks/toolbox/preprocessing.py:90-109)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("c_acctbal"), 2).alias("mu"),
            F.round(F.var_pop("c_acctbal"), 2).alias("v"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q13-Q15: windows, top-k
# --------------------------------------------------------------------------


def q13_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-3 by ROW_NUMBER. Spark pushes a per-partition group limit
    below the shuffle (WindowGroupLimit) so only ~3 rows/key shuffle."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
        .orderBy("o_custkey", "rk")
    )


def q14_window_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame sum (rolling-window analog of §2.3 df.rolling)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("s"),
        )
        .orderBy("user_id", "event_id")
    )


def q15_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject: each partition keeps its own
    top-10, the driver merges 10×partitions rows — no global sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q16: set operations
# --------------------------------------------------------------------------


def q16_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


def q16_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") > 25)
        .select(F.col("p_partkey").alias("k"))
    )
    return li.subtract(p).orderBy("k")  # subtract == EXCEPT DISTINCT


def q16_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


# --------------------------------------------------------------------------
# Q17-Q22: scalar function surface
# --------------------------------------------------------------------------


def q17_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String namespace (P31-adjacent; §2.3 .str.*)."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.length("p_type").cast("long").alias("type_len"),
        )
        .orderBy("p_partkey")
    )


def q18_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer primitive (P31 space_tokenizer, reference
    fireworks/toolbox/text.py:22-28) — split + element access."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey", F.split("p_name", " ").getItem(0).alias("tok0")
        )
        .orderBy("p_partkey")
    )


def q19_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .orderBy("o_orderkey")
    )


def q20_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_quantity"), 2).alias("sqrt_qty"),
            F.round(F.log("l_extendedprice"), 2).alias("ln_price"),
            (F.abs(F.col("l_discount") - 0.05) < 0.001).alias("near_disc"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q21_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / conditional labeling (P8 LabelerPipe semantics, reference
    fireworks/toolbox/pipes.py:374-395)."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
    )
    return o.select("o_orderkey", bucket.alias("bucket")).orderBy("o_orderkey")


def q22_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array (tensor-column) access — the TensorMessage surface (§1.7).
    element_at is 1-based like SQL; the DataFrame getItem is 0-based.
    ``+ 0.0`` normalizes IEEE negative zero (ROUND can yield -0.0, which
    hash-compares differently from 0.0); applied on both sides."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            "label",
            (
                F.round(F.element_at("embedding", 1).cast("double"), 3)
                + F.lit(0.0)
            ).alias("e0"),
            F.size("embedding").cast("long").alias("len"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Q23-Q28: subqueries, buckets, JSON, pivot, approx
# --------------------------------------------------------------------------


def q23_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate +
    join; expressed via spark.sql which is the idiomatic surface for it."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        """
    )


def q24_hash_mod_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod split cardinality (P20 train_test_split proxy,
    reference fireworks/toolbox/preprocessing.py:14-40; RNGs are not
    comparable across engines so the declared check is the split size)."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 5 == 0).agg(
        F.count(F.lit(1)).alias("n")
    )


def q25_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling bucket — batch analog of the streaming window
    (§2.5); same aggregation the Structured Streaming path produces."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("h"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
        .orderBy("h", "event_type")
    )


def q26_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .orderBy("event_id")
    )


def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (§2.3 pivot_table)."""
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.when(urgent, 1)).alias("urgent"),
            F.count(F.when(~urgent, 1)).alias("rest"),
        )
        .orderBy("o_orderstatus")
    )


def q28_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx distinct (scale path for Q10). The sketch is not
    hash-comparable to an exact oracle, so the declared check is the
    tolerance assertion itself: both sides emit within_tol=TRUE."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        (
            F.abs(
                # rsd=0.02: the 1% sketch needs 4x the registers and was
                # the single most expensive aggregate in the registry
                # (2.8s vs 0.4s at sf0.1) with no benefit against the 5%
                # tolerance gate; HLL is deterministic per dataset.
                F.approx_count_distinct("o_custkey", rsd=0.02).cast("double")
                - F.countDistinct("o_custkey").cast("double")
            )
            / F.countDistinct("o_custkey").cast("double")
            < 0.05
        ).alias("within_tol")
    )


RELATIONAL_QUERIES = {
    "q01_scan_projection": q01_scan_projection,
    "q02_filter_predicates": q02_filter_predicates,
    "q03_constant_label": q03_constant_label,
    "q04_inner_join": q04_inner_join,
    "q05_multiway_join_revenue": q05_multiway_join_revenue,
    "q06_left_join_count": q06_left_join_count,
    "q07_semi_join": q07_semi_join,
    "q08_anti_join": q08_anti_join,
    "q09_hash_agg": q09_hash_agg,
    "q10_count_distinct": q10_count_distinct,
    "q11_rollup": q11_rollup,
    "q12_mean_variance": q12_mean_variance,
    "q13_window_rank": q13_window_rank,
    "q14_window_frame_sum": q14_window_frame_sum,
    "q15_topk": q15_topk,
    "q16_intersect": q16_intersect,
    "q16_except": q16_except,
    "q16_union": q16_union,
    "q17_string_funcs": q17_string_funcs,
    "q18_string_split": q18_string_split,
    "q19_date_funcs": q19_date_funcs,
    "q20_math_funcs": q20_math_funcs,
    "q21_case_when": q21_case_when,
    "q22_array_ops": q22_array_ops,
    "q23_correlated_subquery": q23_correlated_subquery,
    "q24_hash_mod_split": q24_hash_mod_split,
    "q25_time_bucket": q25_time_bucket,
    "q26_json_extract": q26_json_extract,
    "q27_pivot": q27_pivot,
    "q28_approx_distinct": q28_approx_distinct,
}

RELATIONAL_ORACLE = {
    "q01_scan_projection": (
        "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey"
    ),
    "q02_filter_predicates": (
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R') "
        "ORDER BY l_orderkey, l_linenumber"
    ),
    "q03_constant_label": (
        "SELECT r_regionkey, r_name, 'region' AS labels FROM region "
        "ORDER BY r_regionkey"
    ),
    "q04_inner_join": (
        "SELECT o.o_orderkey, c.c_name FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey ORDER BY o.o_orderkey"
    ),
    "q05_multiway_join_revenue": (
        "SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)"
        " AS revenue FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name ORDER BY revenue DESC, n.n_name"
    ),
    "q06_left_join_count": (
        "SELECT c.c_custkey, COUNT(o.o_orderkey) AS cnt FROM customer c "
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_custkey ORDER BY cnt DESC, c.c_custkey"
    ),
    "q07_semi_join": (
        "SELECT c_custkey FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 100000) "
        "ORDER BY c_custkey"
    ),
    "q08_anti_join": (
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000) "
        "ORDER BY c_custkey"
    ),
    "q09_hash_agg": (
        "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),2) AS sum_qty,"
        " ROUND(AVG(l_extendedprice),2) AS avg_price, COUNT(*) AS cnt "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    "q10_count_distinct": (
        "SELECT COUNT(DISTINCT o_custkey) AS cd FROM orders"
    ),
    "q11_rollup": (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders "
        "GROUP BY ROLLUP (o_orderstatus, o_orderpriority) "
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
    ),
    "q12_mean_variance": (
        "SELECT c_mktsegment, ROUND(AVG(c_acctbal),2) AS mu, "
        "ROUND(VAR_POP(c_acctbal),2) AS v FROM customer "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    "q13_window_rank": (
        "SELECT o_custkey, o_orderkey, rk FROM ("
        "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER ("
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
        "FROM orders) t WHERE rk <= 3 ORDER BY o_custkey, rk"
    ),
    "q14_window_frame_sum": (
        "SELECT user_id, event_id, ROUND(SUM(value) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),2) AS s "
        "FROM events ORDER BY user_id, event_id"
    ),
    "q15_topk": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "q16_intersect": (
        "SELECT c_nationkey AS k FROM customer "
        "INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k"
    ),
    "q16_except": (
        "SELECT l_partkey AS k FROM lineitem "
        "EXCEPT SELECT p_partkey AS k FROM part WHERE p_size > 25 ORDER BY k"
    ),
    "q16_union": (
        "SELECT c_nationkey AS k FROM customer "
        "UNION SELECT s_nationkey AS k FROM supplier ORDER BY k"
    ),
    "q17_string_funcs": (
        "SELECT p_partkey, UPPER(p_brand) AS brand_u, "
        "SUBSTRING(p_name, 1, 5) AS name5, "
        "CAST(LENGTH(p_type) AS BIGINT) AS type_len "
        "FROM part ORDER BY p_partkey"
    ),
    "q18_string_split": (
        "SELECT p_partkey, string_split(p_name, ' ')[1] AS tok0 "
        "FROM part ORDER BY p_partkey"
    ),
    "q19_date_funcs": (
        "SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,"
        " CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m "
        "FROM orders ORDER BY o_orderkey"
    ),
    "q20_math_funcs": (
        "SELECT l_orderkey, l_linenumber, "
        "ROUND(SQRT(l_quantity),2) AS sqrt_qty, "
        "ROUND(LN(l_extendedprice),2) AS ln_price, "
        "ABS(l_discount - 0.05) < 0.001 AS near_disc "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    "q21_case_when": (
        "SELECT o_orderkey, CASE WHEN o_totalprice > 150000 THEN 'big' "
        "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket "
        "FROM orders ORDER BY o_orderkey"
    ),
    "q22_array_ops": (
        "SELECT vec_id, label, "
        "ROUND(CAST(embedding[1] AS DOUBLE), 3) + 0.0 AS e0, "
        "CAST(array_length(embedding) AS BIGINT) AS len "
        "FROM embeddings ORDER BY vec_id"
    ),
    "q23_correlated_subquery": (
        "SELECT c_custkey FROM customer c "
        "WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 "
        "WHERE c2.c_nationkey = c.c_nationkey) ORDER BY c_custkey"
    ),
    "q24_hash_mod_split": (
        "SELECT COUNT(*) AS n FROM customer WHERE c_custkey % 5 = 0"
    ),
    "q25_time_bucket": (
        "SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS cnt, "
        "ROUND(SUM(value),2) AS sum_val FROM events "
        "GROUP BY 1, 2 ORDER BY h, event_type"
    ),
    "q26_json_extract": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) "
        "AS k FROM events ORDER BY event_id"
    ),
    "q27_pivot": (
        "SELECT o_orderstatus, "
        "COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent, "
        "COUNT(*) FILTER (WHERE o_orderpriority <> '1-URGENT') AS rest "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
    "q28_approx_distinct": ("SELECT TRUE AS within_tol"),
}
