"""Fuzzy-join tests: deletion-neighborhood blocking must be EXACT at
edit distance 1 (every brute-force pair recovered, no extras)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from fireworks_spark.operators.fuzzy import fuzzy_join


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


WORDS = [
    "spark", "spork", "sparks", "park", "stark", "shark",
    "joined", "jointed", "joind", "window", "widow", "windows",
    "exactly", "different",
]


def test_fuzzy_join_equals_bruteforce(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, w string"
    )
    got = {
        (r.lid, r.rid): r.dist
        for r in fuzzy_join(df, df, "id", "id", "w", "w").collect()
    }
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.product(enumerate(WORDS), repeat=2)
        if _lev(a, b) <= 1
    }
    assert got == want  # exact: same pairs, same distances, nothing missed
    assert got[(0, 1)] == 1 and got[(0, 0)] == 0  # spark~spork, self


def test_fuzzy_join_planted_perturbation(spark, sf_dir):
    """Every part name with its 3rd character deleted must join back to its
    canonical form at distance 1 — the dirty-to-canonical resolution
    shape."""
    from fireworks_spark.tables import table

    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.lower("p_name").alias("nm")
    )
    damaged = p.select(
        "p_partkey",
        F.concat(
            F.col("nm").substr(F.lit(1), F.lit(2)),
            F.col("nm").substr(F.lit(4), F.length("nm")),
        ).alias("dm"),
    )
    out = fuzzy_join(damaged, p, "p_partkey", "p_partkey", "dm", "nm")
    hits = {
        (r.lid, r.rid) for r in out.filter(F.col("lid") == F.col("rid")).collect()
    }
    n = p.count()
    assert len(hits) == n  # every damaged row finds its source


def test_fuzzy_join_dist2_equals_bruteforce(spark):
    """Two-deletion neighborhood blocking must be EXACT at distance 2:
    same pairs and distances as the brute-force join, nothing missed."""
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, w string"
    )
    got = {
        (r.lid, r.rid): r.dist
        for r in fuzzy_join(df, df, "id", "id", "w", "w", max_dist=2).collect()
    }
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.product(enumerate(WORDS), repeat=2)
        if _lev(a, b) <= 2
    }
    assert got == want
    # distance-exactly-2 pairs must be present (the new capability):
    assert any(d == 2 for d in got.values())


def test_fuzzy_join_dist2_short_and_empty_strings(spark):
    """Length <= 2 strings exercise the empty-variant corner of the
    2-deletion neighborhood (sequence(1,0) descending)."""
    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "ba"), (4, "abc"), (5, "xy")]
    df = spark.createDataFrame(rows, "id long, w string")
    got = {
        (r.lid, r.rid): r.dist
        for r in fuzzy_join(df, df, "id", "id", "w", "w", max_dist=2).collect()
    }
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.product(rows, repeat=2)
        if _lev(a, b) <= 2
    }
    assert got == want


def test_fuzzy_join_rejects_wider_radius(spark):
    df = spark.createDataFrame([(0, "x")], "id long, w string")
    with pytest.raises(NotImplementedError):
        fuzzy_join(df, df, "id", "id", "w", "w", max_dist=3)
