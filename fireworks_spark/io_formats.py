"""Serialization formats (SURVEY.md §1.6): the reference's Message.read/to
surface (csv/json/parquet/feather/sql/...; reference
fireworks/core/message.py:13-17, 156-235) as thin, consistent wrappers over
the Spark reader/writer — schema-carrying where the format allows, explicit
schema injection where it doesn't (CSV/JSON infer or accept a StructType).

The reference's native format (gzip tar of df.parquet + torch blobs,
message.py:237-302) maps to plain Parquet: array columns serialize natively,
so no second container is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_READ_OPTS = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Format-dispatched read (Message.read). For CSV/JSON pass ``schema``
    to avoid inference scans at scale (inference reads the data twice)."""
    reader = spark.read.format(fmt)
    for k, v in {**_READ_OPTS.get(fmt, {}), **options}.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Format-dispatched write (Message.to). ``partition_by`` produces
    hive-style directory partitioning — the thing that makes downstream
    partition pruning work, so use it on every production sink whose
    readers filter by a column."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
