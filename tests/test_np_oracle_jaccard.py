"""tools/np_oracle_jaccard.py (round 15): the exact n-gram Jaccard
oracle family computed as one numpy pair table. At sf3 the SQL oracles'
shared `inter` CTE materializes ~1.17e9 join rows (27,931 shingles at
mean df ~284) and DuckDB ground single-threaded for 30+ minutes without
reaching an interrupt check, so the sweep substitutes this tool — these
tests pin every derivation byte-equal to the registry's own SQL oracles
at sf0.01, keeping the sweep's ground truth the oracle's, just computed
as a flat in-memory pass (same precedent as the iterative closure
substitute, tests/test_sweep_closure.py)."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

_spec = importlib.util.spec_from_file_location(
    "np_oracle_jaccard",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)),
        "tools",
        "np_oracle_jaccard.py",
    ),
)
npj = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(npj)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pair_table():
    return npj.jaccard_pairs_table(SF_DIR)


@pytest.fixture(scope="module")
def con():
    from fireworks_spark.oracle import duckdb_connect

    return duckdb_connect(SF_DIR)


def _sql(con, name: str) -> pd.DataFrame:
    from fireworks_spark.registry import ORACLES

    return con.sql(ORACLES[name]).df().reset_index(drop=True)


def _eq(want: pd.DataFrame, got: pd.DataFrame) -> bool:
    return want.equals(got.astype(want.dtypes.to_dict()))


def test_self_pairs_match_sql(pair_table, con):
    ida, idb, jac = pair_table
    for name, thr in (
        ("q31_dedup_ngram_jaccard", 0.5),
        ("q32_dedup_minhash_lsh", 0.8),
    ):
        m = jac >= thr
        got = (
            pd.DataFrame({"ida": ida[m], "idb": idb[m], "jac": jac[m]})
            .sort_values(["ida", "idb"])
            .reset_index(drop=True)
        )
        want = _sql(con, name)
        assert len(want) > 0, f"{name}: empty oracle voids the pin"
        assert _eq(want, got), name


def test_cross_pairs_match_sql(pair_table, con):
    ida, idb, jac = pair_table
    m1 = (ida % 2 == 0) & (idb % 2 == 1)
    m2 = (ida % 2 == 1) & (idb % 2 == 0)
    c_lid = np.concatenate((ida[m1], idb[m2]))
    c_rid = np.concatenate((idb[m1], ida[m2]))
    c_jac = np.concatenate((jac[m1], jac[m2]))
    for name, thr in (
        ("q134_jaccard_join", 0.5),
        ("q135_minhash_join", 0.8),
    ):
        m = c_jac >= thr
        got = (
            pd.DataFrame({"lid": c_lid[m], "rid": c_rid[m], "jac": c_jac[m]})
            .sort_values(["lid", "rid"])
            .reset_index(drop=True)
        )
        want = _sql(con, name)
        assert len(want) > 0, f"{name}: empty oracle voids the pin"
        assert _eq(want, got), name


def test_dedup_against_survivors_match_sql(pair_table, con):
    ida, idb, jac = pair_table
    m1 = (ida % 2 == 0) & (idb % 2 == 1)
    m2 = (ida % 2 == 1) & (idb % 2 == 0)
    rid = np.concatenate((idb[m1], ida[m2]))
    cj = np.concatenate((jac[m1], jac[m2]))
    dup = set(rid[cj >= 0.8].tolist())
    docs = con.sql(
        "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id"
    ).df()
    got = docs[~docs["doc_id"].isin(dup)].reset_index(drop=True)
    want = _sql(con, "q168_stream_dedup_against")
    assert len(want) > 0
    assert want.equals(got)


def test_closure_pairs_feed_the_pinned_union_find(pair_table, con):
    """Injecting the numpy jac>=0.8 pairs into sf1_sweep's pairs cache
    must reproduce the recursive closure oracle exactly (the union-find
    itself is pinned by test_sweep_closure; this pins the HANDOFF)."""
    from fireworks_spark.queries_pipeline import CLOSURE_JACCARD_THRESHOLD

    _s2 = importlib.util.spec_from_file_location(
        "sf1_sweep_npj_test",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "tools",
            "sf1_sweep.py",
        ),
    )
    sweep = importlib.util.module_from_spec(_s2)
    _s2.loader.exec_module(sweep)
    ida, idb, jac = pair_table
    m = jac >= CLOSURE_JACCARD_THRESHOLD
    sweep._PAIRS_CACHE["npj-test"] = pd.DataFrame(
        {"ida": ida[m], "idb": idb[m]}
    )
    got = sweep.closure_oracle_df(con, "q42_dup_clusters", cache_key="npj-test")
    from fireworks_spark.registry import ORACLES

    want = con.sql(ORACLES["q42_dup_clusters"]).df().reset_index(drop=True)
    assert len(want) > 0
    assert want.equals(got.astype(want.dtypes.to_dict()))
