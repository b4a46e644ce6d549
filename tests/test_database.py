"""Database-layer round-trips (reference database_test.py:100-228 behavior):
create/insert/query/filter/delete/update/upsert against a tmpdir parquet
table, plus pushdown/pruning plan checks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fireworks_spark import database as db

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    t = db.create_table(spark, path, SCHEMA)
    t.insert(
        spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(10)], SCHEMA
        )
    )
    return t


def test_create_reflect_roundtrip(spark, tmp_path, tbl):
    assert db.reflect_table(spark, tbl.path) == SCHEMA
    assert db.parse_columns_and_types(tbl.df()) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
    }


def test_insert_and_count(spark, tbl):
    assert len(tbl) == 10
    tbl.insert(spark.createDataFrame([(100, "x", 1.0)], SCHEMA))
    assert tbl.count() == 11


def test_query_pruning_and_filter_pushdown(tbl):
    q = tbl.query("id", "score").filter(F.col("id") > 5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "name" not in plan.split("ReadSchema")[1]
    assert "PushedFilters: [" in plan and "GreaterThan(id,5)" in plan
    assert q.count() == 4


def test_delete_list_and_df(spark, tbl):
    tbl.delete("id", [0, 1, 2])
    assert sorted(r.id for r in tbl.df().collect()) == list(range(3, 10))
    keys = spark.createDataFrame([(9,)], "k long")
    tbl.delete("id", keys)
    assert sorted(r.id for r in tbl.df().collect()) == list(range(3, 9))


def test_update_replaces_only_matching(spark, tbl):
    batch = spark.createDataFrame(
        [(3, "upd", 99.0), (777, "ghost", -1.0)], SCHEMA
    )
    tbl.update(batch, "id")
    rows = {r.id: (r.name, r.score) for r in tbl.df().collect()}
    assert rows[3] == ("upd", 99.0)
    assert 777 not in rows  # non-matching batch row ignored by UPDATE
    assert rows[4] == ("n4", 4.0)


def test_upsert_updates_and_inserts(spark, tbl):
    batch = spark.createDataFrame(
        [(3, "upd", 99.0), (777, "new", -1.0)], SCHEMA
    )
    tbl.upsert(batch, "id")
    rows = {r.id: (r.name, r.score) for r in tbl.df().collect()}
    assert rows[3] == ("upd", 99.0)
    assert rows[777] == ("new", -1.0)
    assert tbl.count() == 11


def test_swap_preserves_data_on_disk(spark, tbl):
    """After a mutation the table re-reads from disk (not cached lineage)."""
    tbl.delete("id", [5])
    fresh = db.Table(spark, tbl.path).df()
    assert sorted(r.id for r in fresh.collect()) == [0, 1, 2, 3, 4, 6, 7, 8, 9]


def test_compact_reduces_file_count(spark, tmp_path):
    p = str(tmp_path / "frag")
    df = spark.range(240).withColumn("v", F.col("id") * 2)
    df.repartition(12).write.parquet(p)
    t = db.Table(spark, p)
    before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert before == 12
    n = t.compact(target_mb=512)
    after = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert n == 1 and after == 1
    assert t.count() == 240
    assert t.df().agg(F.sum("v")).collect()[0][0] == 240 * 239


def test_transaction_multi_op_commit(spark, tbl):
    """Several operations under ONE commit (reference database.py:33-43):
    nothing hits storage until the context exits, then all land atomically."""
    fresh = db.Table(spark, tbl.path)
    with tbl.transaction() as tx:
        tx.insert(spark.createDataFrame([(100, "x", 1.0)], SCHEMA))
        tx.delete("id", [0, 1])
        tx.update(spark.createDataFrame([(5, "upd", 50.0)], SCHEMA), "id")
        tx.upsert(spark.createDataFrame([(200, "ups", 2.0)], SCHEMA), "id")
        # read-your-writes inside the transaction...
        assert tx.df().count() == 10
        # ...but storage is untouched until commit
        assert fresh.count() == 10
    rows = {r.id: (r.name, r.score) for r in fresh.df().collect()}
    assert set(rows) == {2, 3, 4, 5, 6, 7, 8, 9, 100, 200}
    assert rows[5] == ("upd", 50.0) and rows[200] == ("ups", 2.0)


def test_transaction_rollback_on_exception(spark, tbl):
    with pytest.raises(ValueError, match="boom"):
        with tbl.transaction() as tx:
            tx.delete("id", list(range(10)))
            raise ValueError("boom")
    assert tbl.count() == 10  # untouched
    with tbl.transaction() as tx:
        tx.insert(spark.createDataFrame([(50, "y", 5.0)], SCHEMA))
        tx.rollback()
    assert tbl.count() == 10
    with pytest.raises(RuntimeError, match="already"):
        tx.insert(spark.createDataFrame([(51, "z", 5.0)], SCHEMA))


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """Real JDBC write + read against embedded Derby (the Derby jars ship
    with Spark for the metastore, so no external server is needed):
    write_jdbc batches inserts executor-side, read_jdbc scans back with
    predicate pushdown into the remote SQL, and a predicates= read splits
    into one partition per range."""
    from fireworks_spark.database import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    # uppercase column names: Derby uppercases unquoted identifiers, so
    # this keeps Spark's quoted DDL and its unquoted pushdown SQL agreeing
    src = spark.range(0, 100).selectExpr(
        "id as ID", "cast(id * 2.5 as double) as VAL", "concat('n', id) as NAME"
    )
    write_jdbc(src, url, "t_round", mode="overwrite", **drv)

    back = read_jdbc(spark, url, "t_round", **drv)
    assert back.count() == 100
    assert back.filter("ID = 7").collect()[0].NAME == "n7"
    # pushdown: the JDBC relation reports the pushed filter in the plan
    plan = back.filter("ID < 10")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ID" in plan

    split = read_jdbc(
        spark, url, "t_round",
        predicates=["ID < 50", "ID >= 50"], **drv,
    )
    assert split.rdd.getNumPartitions() == 2
    assert split.count() == 100
