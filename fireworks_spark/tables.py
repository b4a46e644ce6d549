"""Test-table loaders (driver-generated parquet, TESTDATA.md).

The reference binds sources as Pipes (BioSeqPipe, TablePipe — reference
fireworks/toolbox/pipes.py:18-68, fireworks/extensions/database.py:11-51);
here a source is simply ``spark.read.parquet`` — lazy, partitioned, with
column pruning and predicate pushdown handled by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Parquet scan => columnar, pruned, pushed-down.

    ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects. We read nanos as epoch-nanos longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    timestamps — the same ns→us truncation DuckDB applies, so both engines
    see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        # get_spark sets this at session build; set here too so the driver's
        # own session (not built by get_spark) can read events.
        if (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            != "true"
        ):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # Integer ns->us truncation: `div` stays in long arithmetic.
            # (`/` would round-trip through double, whose 2^53 exact range
            # epoch-nanos exceed — off-by-1us near boundaries vs DuckDB.)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
