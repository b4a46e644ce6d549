"""Central registry of declared queries and their DuckDB oracles.

``QUERIES``: name -> Callable[(SparkSession, sf_dir) -> DataFrame]
``ORACLES``: name -> DuckDB SQL string (omitted for non-SQL-expressible ops,
which the driver records as a weaker rows-only check).
"""

from __future__ import annotations

from fireworks_spark.queries_relational import (
    RELATIONAL_ORACLE,
    RELATIONAL_QUERIES,
)

QUERIES: dict = {}
ORACLES: dict = {}

from fireworks_spark.queries_pipeline import (
    PIPELINE_ORACLE,
    PIPELINE_QUERIES,
)
from fireworks_spark.queries_toolbox import (
    TOOLBOX_ORACLE,
    TOOLBOX_QUERIES,
)
from fireworks_spark.queries_database import (
    DATABASE_ORACLE,
    DATABASE_QUERIES,
)
from fireworks_spark.queries_mlfeed import (
    MLFEED_ORACLE,
    MLFEED_QUERIES,
)
from fireworks_spark.queries_relational2 import (
    RELATIONAL2_ORACLE,
    RELATIONAL2_QUERIES,
)
from fireworks_spark.queries_streaming import (
    STREAMING_ORACLE,
    STREAMING_QUERIES,
)
from fireworks_spark.queries_ranking import (
    RANKING_ORACLE,
    RANKING_QUERIES,
)

QUERIES.update(RELATIONAL_QUERIES)
ORACLES.update(RELATIONAL_ORACLE)
QUERIES.update(PIPELINE_QUERIES)
ORACLES.update(PIPELINE_ORACLE)
QUERIES.update(TOOLBOX_QUERIES)
ORACLES.update(TOOLBOX_ORACLE)
QUERIES.update(DATABASE_QUERIES)
ORACLES.update(DATABASE_ORACLE)
QUERIES.update(MLFEED_QUERIES)
ORACLES.update(MLFEED_ORACLE)
QUERIES.update(RELATIONAL2_QUERIES)
ORACLES.update(RELATIONAL2_ORACLE)
QUERIES.update(STREAMING_QUERIES)
ORACLES.update(STREAMING_ORACLE)
QUERIES.update(RANKING_QUERIES)
ORACLES.update(RANKING_ORACLE)


# ---------------------------------------------------------------------------
# Driver-check rotation: a literal STALENESS round-robin, generated from the
# recorded CORRECTNESS_r*.json history at import time (not hand-listed).
#
# Generation rule: a query's "freshness" is the highest round whose
# CORRECTNESS file recorded it VALUE-GREEN (hash_match true). Queries are
# ordered stalest-first (freshness ascending, registry insertion order as the
# tie-break), so the driver's ~50-query window always re-checks the queries
# whose last value evidence is oldest, and every query re-earns a green row
# every ceil(len(QUERIES)/50) rounds. Rows never value-checked — new queries,
# and rows-only ops whose history is all `no_oracle` — have freshness 0 and
# therefore lead the window permanently (the driver keeps recording their
# row counts; a newly oracle-backed op graduates to hash-checked the very
# next round). A recorded FAILURE does not refresh: only hash-green rows
# push a query to the back of the rotation.
def staleness_order() -> "list[str]":
    """Stalest-first query order derived from CORRECTNESS_r*.json."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    last_green: dict = {q: 0 for q in QUERIES}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue  # a malformed history file must not break the registry
        for name, row in rows.items():
            if name in last_green and row.get("hash_match") is True:
                last_green[name] = max(last_green[name], rnd)
    insertion = {q: i for i, q in enumerate(QUERIES)}
    return sorted(QUERIES, key=lambda q: (last_green[q], insertion[q]))


def _rotate(order: "list[str]") -> None:
    missing = [q for q in order if q not in QUERIES]
    if missing:  # a typo here silently shrinks the driver check window
        raise KeyError(f"rotation names not in QUERIES: {missing}")
    full = list(order) + [q for q in QUERIES if q not in order]
    for mapping in (QUERIES, ORACLES):
        rotated = {k: mapping[k] for k in full if k in mapping}
        mapping.clear()
        mapping.update(rotated)


_rotate(staleness_order())
