"""tools/sf1_sweep.py's iterative closure evaluator (round 14): the
q42/q43/q115 recursive-CTE oracles cost 300-1900s at sf1 on this host
(SCALE.md "Round 13: sf1 sweep"), so the sweep evaluates them as DuckDB
jac-pairs + Python min-label union-find. These tests pin that substitute
to the recursive SQL itself at sf0.01 — same rows, same values — so the
sf1 sweep's ground truth remains the oracle's, just computed iteratively.
"""

from __future__ import annotations

import importlib.util
import os

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "sf1_sweep",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools", "sf1_sweep.py"
    ),
)
sf1_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sf1_sweep)

SF_DIR = "/root/testdata/sf0.01"


def _con():
    from fireworks_spark.oracle import duckdb_connect

    return duckdb_connect(SF_DIR)


def test_iterative_closure_matches_recursive_sql():
    from fireworks_spark.registry import ORACLES

    con = _con()
    for name in sf1_sweep.CLOSURE_QUERIES:
        want = con.sql(ORACLES[name]).df()
        got = sf1_sweep.closure_oracle_df(con, name)
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True).astype("int64"),
            want.reset_index(drop=True).astype("int64"),
            check_dtype=False,
            obj=name,
        )


def test_union_find_min_label_semantics():
    """The union-find must produce MIN-reachable-id labels (what the
    recursive cc/canon CTE computes), including through chains merged
    high-to-low: pairs (5,9),(9,2),(7,8) -> {2,5,9}->2, {7,8}->7."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    members = set()
    for a, b in [(5, 9), (9, 2), (7, 8)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        members |= {a, b}
    cluster = {m: find(m) for m in members}
    assert cluster == {5: 2, 9: 2, 2: 2, 7: 7, 8: 7}


def test_sweep_meta_sf_derives_from_dir():
    """VERDICT r14 nit #4: SWEEP_SF3.json carried '"sf": 1' against an
    sf3 sf_dir because the meta hardcoded 1. The sf now parses from the
    fixture dir name; unparseable dirs record null rather than a lie."""
    assert sf1_sweep._sf_of("/root/repo/testdata_sf1") == 1
    assert sf1_sweep._sf_of("/root/repo/testdata_sf3") == 3
    assert sf1_sweep._sf_of("/root/testdata/sf0.1") == 0.1
    assert sf1_sweep._sf_of("/root/testdata/sf0.01") == 0.01
    assert sf1_sweep._sf_of("/tmp/fixture") is None


def test_closure_split_k_single_source():
    """ADVICE r14: q115's modulus had drifted into three literals (the
    Spark query's k=5, the oracle SQL's % 5, the sweep's % 5). All three
    now read CLOSURE_SPLIT_K; this guards the oracle SQL and the sweep
    against a silent re-divergence if k is ever recalibrated."""
    from fireworks_spark.queries_pipeline import CLOSURE_SPLIT_K
    from fireworks_spark.registry import ORACLES

    assert f"% {CLOSURE_SPLIT_K} AS BIGINT" not in ""  # sanity: f-string
    assert (
        f"% {CLOSURE_SPLIT_K} " in ORACLES["q115_leakage_safe_split"]
    )
