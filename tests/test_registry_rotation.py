"""Registry-rotation and documentation-consistency gates.

Two drift failure modes are pinned here:
- the driver-check rotation must be a literal staleness round-robin derived
  from the recorded CORRECTNESS_r*.json history (VERDICT r5 #1), and
- COVERAGE.md's declared-query table must agree with the registry (every
  query listed, oracle column matching ``ORACLES`` membership — VERDICT r5
  "what's wrong" #1: stale doc rows must fail pytest, not linger).
"""

import json
import re
from pathlib import Path

from fireworks_spark.registry import ORACLES, QUERIES, staleness_order

REPO = Path(__file__).resolve().parents[1]


def _last_green() -> dict:
    last = {q: 0 for q in QUERIES}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        if m is None:
            continue
        rnd = int(m.group(1))
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if name in last and row.get("hash_match") is True:
                last[name] = max(last[name], rnd)
    return last


def test_registry_order_is_staleness_round_robin():
    """list(QUERIES) must walk queries stalest-first: the round in which a
    query last earned a hash-green driver row is non-decreasing along the
    registry, so the driver's ~50-query window always re-checks the oldest
    evidence."""
    last = _last_green()
    order = list(QUERIES)
    fresh = [last[q] for q in order]
    assert fresh == sorted(fresh), (
        "registry order is not staleness-sorted; first offenders: "
        + str(
            [
                (order[i - 1], fresh[i - 1], order[i], fresh[i])
                for i in range(1, len(order))
                if fresh[i] < fresh[i - 1]
            ][:5]
        )
    )
    assert order == staleness_order()


def test_never_green_queries_lead_the_window():
    """Queries with no hash-green history (new, or rows-only by design)
    must sit at the very front so the driver checks them every round."""
    last = _last_green()
    order = list(QUERIES)
    n_never = sum(1 for v in last.values() if v == 0)
    assert all(last[q] == 0 for q in order[:n_never])


def test_oracles_is_subset_and_rotation_preserves_pairing():
    assert set(ORACLES) <= set(QUERIES)
    # the rotation rebuilds both dicts; ORACLES must stay in QUERIES order
    qorder = [q for q in QUERIES if q in ORACLES]
    assert list(ORACLES) == qorder


def _coverage_rows() -> dict:
    rows = {}
    for line in (REPO / "COVERAGE.md").read_text().splitlines():
        m = re.match(r"\|\s*(q\d+\w*)\s*\|.*\|\s*(.+?)\s*\|\s*$", line)
        if m:
            rows[m.group(1)] = m.group(2)
    return rows


def test_plans_md_audits_every_registry_query():
    """PLANS.md (tools/plan_audit.py output) must cover exactly the
    registry — a new query without a regenerated audit fails here, keeping
    the no-cartesian claim complete — and no row may carry the CART! or
    ERR flags."""
    rows = {}
    for line in (REPO / "PLANS.md").read_text().splitlines():
        m = re.match(r"\|\s*(q\d+\w*)\s*\|(.*)", line)
        if m:
            rows[m.group(1)] = m.group(2)
    assert set(rows) == set(QUERIES), (
        f"PLANS.md missing {sorted(set(QUERIES) - set(rows))}, "
        f"extra {sorted(set(rows) - set(QUERIES))} — rerun tools/plan_audit.py"
    )
    flagged = [q for q, r in rows.items() if "CART!" in r or "ERR" in r]
    assert not flagged, f"PLANS.md flags: {flagged}"


def test_coverage_md_query_table_matches_registry():
    """COVERAGE.md's declared-query table: one row per registry query, and
    the oracle column ('DuckDB SQL' vs 'rows-only ...') must match actual
    ``ORACLES`` membership — stale doc rows fail here."""
    rows = _coverage_rows()
    missing = [q for q in QUERIES if q not in rows]
    assert not missing, f"COVERAGE.md missing query rows: {missing}"
    extra = [q for q in rows if q not in QUERIES]
    assert not extra, f"COVERAGE.md lists unknown queries: {extra}"
    wrong = [
        (q, status)
        for q, status in rows.items()
        if ("DuckDB" in status) != (q in ORACLES)
    ]
    assert not wrong, f"COVERAGE.md oracle column out of date: {wrong}"
