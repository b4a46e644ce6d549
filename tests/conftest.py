from __future__ import annotations

import os

import pytest

# throwaway catalog tables (bucketed-join / saveAsTable tests) on tmpfs
# scratch — opt-in gate in session.get_spark (ADVICE r15)
os.environ.setdefault("FIREWORKS_SCRATCH_WAREHOUSE", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from fireworks_spark.session import get_spark

    spark = get_spark(
        app_name="fireworks-spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8")
        ),
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from fireworks_spark.oracle import duckdb_connect

    return duckdb_connect(sf_dir)
