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

QUERIES.update(RELATIONAL_QUERIES)
ORACLES.update(RELATIONAL_ORACLE)

try:  # pipeline (dedup / similarity / text) queries — added as implemented
    from fireworks_spark.queries_pipeline import (
        PIPELINE_ORACLE,
        PIPELINE_QUERIES,
    )

    QUERIES.update(PIPELINE_QUERIES)
    ORACLES.update(PIPELINE_ORACLE)
except ImportError:
    pass

try:  # toolbox-operator-backed queries
    from fireworks_spark.queries_toolbox import (
        TOOLBOX_ORACLE,
        TOOLBOX_QUERIES,
    )

    QUERIES.update(TOOLBOX_QUERIES)
    ORACLES.update(TOOLBOX_ORACLE)
except ImportError:
    pass
