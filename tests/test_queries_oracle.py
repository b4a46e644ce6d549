"""Differential tests: every declared query runs on Spark and DuckDB over the
same parquet and must agree (row-count + schema + order-insensitive values).
This mirrors the driver's t2 gate (SURVEY.md §5 tier 2)."""

from __future__ import annotations

import pytest

from fireworks_spark.oracle import compare
from fireworks_spark.registry import ORACLES, QUERIES

ORACLE_BACKED = [k for k in QUERIES if k in ORACLES]


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    sdf = QUERIES[name](spark, sf_dir)
    odf = oracle_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


NO_ORACLE = [k for k in QUERIES if k not in ORACLES]


def test_no_oracle_bucket(spark, sf_dir):
    """Rows-only fallback for queries without an oracle. The bucket has
    been EMPTY since round 7 (every registry query is value-checked) —
    one always-collected test instead of an empty parametrize, which
    pytest would report as a mystery skip. (COVERAGE.md's oracle column
    is cross-checked against ORACLES in test_registry_rotation, so a
    silently dropped oracle still fails loudly there.)"""
    for name in NO_ORACLE:
        assert QUERIES[name](spark, sf_dir).count() >= 0
