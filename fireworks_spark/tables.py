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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-tz TIMESTAMP, whatever the
    parquet writer stored:

    - ``bigint`` — TIMESTAMP(NANOS) read via ``nanosAsLong``: integer ns->us
      truncation (``div`` stays in long arithmetic; ``/`` would round-trip
      through double, whose 2^53 exact range epoch-nanos exceed — off-by-1us
      near boundaries vs DuckDB).
    - ``timestamp_ntz`` — ``timestamp[us]`` parquet: cast to TIMESTAMP. The
      session timezone is UTC, so the instant is identical to what DuckDB
      reads from the same file.
    - ``timestamp`` — already normalized; no-op.

    One shared choke point so a testdata regeneration that changes the
    physical ts type shows up here (and in tests/test_schema_canary), not as
    scattered query failures.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
        )
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Parquet scan => columnar, pruned, pushed-down.

    ``events.parquet`` has stored ``ts`` as TIMESTAMP(NANOS) (read as
    epoch-nanos longs via ``spark.sql.legacy.parquet.nanosAsLong``) and as
    ``timestamp[us]`` (read as TIMESTAMP_NTZ) across driver testdata
    generations; :func:`normalize_event_ts` maps either to session-tz
    TIMESTAMP with values identical to DuckDB's view of the same file.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # get_spark sets these at session build; set here too so the
        # driver's own session (not built by get_spark) behaves
        # identically: nanosAsLong for nanos-era events, and UTC so the
        # NTZ->TIMESTAMP cast and hour/day/week truncations are wall-clock
        # arithmetic matching DuckDB's naive view (a DST-bearing session
        # timezone would skew epoch deltas across transitions).
        if (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            != "true"
        ):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
