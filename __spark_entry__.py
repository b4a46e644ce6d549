"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 4-way-join revenue query at sf0.001.
``queries()`` / ``oracle_sql()`` expose every declared query from
SURVEY.md §2.4 plus the LLM-data-pipeline operators (dedup, similarity,
text analysis); see fireworks_spark/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fireworks_spark.queries_relational import q05_multiway_join_revenue

    return q05_multiway_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fireworks_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fireworks_spark.registry import ORACLES

    return dict(ORACLES)
