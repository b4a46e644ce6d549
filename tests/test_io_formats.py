"""Serialization round-trips (§1.6): csv/json/parquet/orc write -> read
equality, partitioned writes prune, arrays survive parquet (the reference's
native tar(parquet+torch) collapses to plain parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fireworks_spark import io_formats as io


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, f"n{i}", float(i) / 4, i % 3) for i in range(24)],
        "id long, name string, score double, grp long",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, df, fmt):
    path = str(tmp_path / fmt)
    io.write_table(df, path, fmt)
    back = io.read_table(spark, path, fmt, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_array_columns_survive_parquet(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0])], "id long, v array<double>"
    )
    p = str(tmp_path / "arr")
    io.write_table(df, p, "parquet")
    back = io.read_table(spark, p, "parquet")
    assert {r.id: r.v for r in back.collect()} == {1: [1.0, 2.0], 2: [3.0]}


def test_partitioned_write_prunes(spark, tmp_path, df):
    p = str(tmp_path / "part")
    io.write_table(df, p, "parquet", partition_by=["grp"])
    back = io.read_table(spark, p, "parquet").filter(F.col("grp") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "grp" in plan.split("PartitionFilters")[1][:80]
    assert back.count() == 8


def test_bucketed_join_has_no_shuffle(spark, df):
    # Two tables bucketed identically on the join key: the join plan must
    # contain zero Exchange operators — the co-located-join guarantee that
    # makes repeated fact-to-fact joins shuffle-free at scale.
    other = df.select(F.col("id"), (F.col("id") * 2).alias("double_id"))
    io.write_bucketed(df, "t_bleft", ["id"], num_buckets=4, sort_cols=["id"])
    io.write_bucketed(other, "t_bright", ["id"], num_buckets=4, sort_cols=["id"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = io.bucketed_join(spark, "t_bleft", "t_bright", ["id"])
        assert joined.count() == 24
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_zorder_key_matches_python_morton(spark):
    from fireworks_spark import io_formats

    rows = [(x, y) for x in range(8) for y in range(8)]
    d = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["k"]
        for r in d.select(
            "x", "y", io_formats.zorder_key(["x", "y"], bits=3).alias("k")
        ).collect()
    }

    def morton(x, y):
        k = 0
        for i in range(3):
            k |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return k

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_sort_clusters_both_columns(spark, tmp_path):
    from fireworks_spark import io_formats

    rows = [(x, y) for x in range(64) for y in range(64)]
    d = spark.createDataFrame(rows, "x int, y int").repartition(8)
    out = str(tmp_path / "z")
    io_formats.zorder_sort(d, ["x", "y"], bits=6, num_files=8).write.mode(
        "overwrite"
    ).parquet(out)
    import pyarrow.parquet as pq
    import glob as g

    spans_x, spans_y, nfiles = [], [], 0
    for f in g.glob(out + "/part-*.parquet"):
        t = pq.read_table(f)
        if t.num_rows == 0:
            continue
        nfiles += 1
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans_x.append(max(xs) - min(xs))
        spans_y.append(max(ys) - min(ys))
    assert nfiles >= 4
    # Z-order keeps BOTH columns clustered: the typical file's span is well
    # under the global span (63) on each dimension (a file that straddles a
    # top-level quadrant boundary may still cover the full range — median,
    # not max, is the layout property). A plain sort on x would give
    # span_y == 63 in EVERY file.
    assert sorted(spans_x)[len(spans_x) // 2] < 40
    assert sorted(spans_y)[len(spans_y) // 2] < 40


def test_feather_roundtrip(spark, tmp_path):
    """Distributed feather sink then source must round-trip values and
    schema (modulo Spark's NTZ preference for naive arrow timestamps)."""
    from fireworks_spark.io_formats import read_feather, write_feather

    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id", "cast(id * 1.5 as double) as x", "concat('r', id) as s"
    )
    out = str(tmp_path / "fth")
    write_feather(df, out)
    import glob

    parts = glob.glob(out + "/part-*.feather")
    assert len(parts) == 4  # one file per input partition
    back = read_feather(spark, out)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert back.count() == 1000
    assert (
        back.selectExpr("sum(id)", "round(sum(x), 2)").collect()
        == df.selectExpr("sum(id)", "round(sum(x), 2)").collect()
    )


def test_feather_single_file_read(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.feather as pf

    from fireworks_spark.io_formats import read_feather

    f = str(tmp_path / "one.feather")
    pf.write_feather(
        pa.Table.from_pandas(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})),
        f,
    )
    got = read_feather(spark, f).orderBy("a").collect()
    assert [(r.a, r.b) for r in got] == [(1, "x"), (2, "y"), (3, "z")]


def test_feather_roundtrip_complex_types(spark, sf_dir, tmp_path):
    """Arrow IPC must carry array<float> and timestamp columns losslessly
    through the file-parallel connector."""
    from pyspark.sql import functions as F

    from fireworks_spark.io_formats import read_feather, write_feather
    from fireworks_spark.tables import table

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = table(spark, sf_dir, "events").select("event_id", "ts")

    d1 = str(tmp_path / "emb")
    write_feather(e, d1)
    back = read_feather(spark, d1)
    assert dict(back.dtypes)["embedding"] == "array<float>"
    s0 = e.select(F.sum(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x))).collect()[0][0]
    s1 = back.select(F.sum(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x))).collect()[0][0]
    assert abs(s0 - s1) < 1e-6

    d2 = str(tmp_path / "ev")
    write_feather(ev, d2)
    back2 = read_feather(spark, d2)
    # session-tz TIMESTAMP goes out as tz-aware arrow and must come back
    # to the same instants
    a = ev.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()[0]
    b = back2.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()[0]
    assert tuple(a) == tuple(b)
