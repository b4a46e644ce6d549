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
