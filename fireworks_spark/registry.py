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
# Driver-check rotation. The correctness driver walks the first N registry
# entries in insertion order; rounds 1-3 only ever reached the same leading
# 55, so the queries below — green in the local oracle suite but never in a
# driver CORRECTNESS file — are rotated to the front. Twice-driver-green
# q01..q28 et al. go last. Remove this block once every query has a
# driver-green row.
_NEVER_DRIVER_CHECKED = [
    "q115_leakage_safe_split",
    "q114_feather_roundtrip",
    "q111_time_rollup",
    "q112_mg_heavy_hitters",
    "q113_rebalance_strata",
    "q29_asof_join",
    "q81_interval_join",
    "q91_rolling_time_window",
    "q68_stream_tumbling",
    "q69_stream_sliding",
    "q107_bpe_merges",
    "q108_bpe_encode",
    "q109_ngram_novelty",
    "q110_chunk_dup_stats",
    "q99_profile",
    "q100_heavy_hitters",
    "q101_winsorize",
    "q104_dsir_weights",
    "q50_shuffle_permutation",
    "q51_repeat",
    "q52_split_assign",
    "q53_interleave",
    "q54_label_onehot",
    "q55_standardize",
    "q56_pad",
    "q57_make_indices",
    "q58_hstack",
    "q59_row_index",
    "q60_delete_semantics",
    "q61_update_semantics",
    "q62_upsert_semantics",
    "q63_linear_score",
    "q64_batch_transform",
    "q65_grouped_normalize",
    "q66_media_meta",
    "q67_media_features",
    "q93_frame_sample",
    "q94_audio_windows",
    "q92_approx_percentile",
    "q95_salted_join",
    "q96_cogroup_asof",
    "q79_session_windows",
    "q80_grouping_sets",
    "q70_lag_lead",
    "q71_cube",
    "q72_percentile",
    "q73_exists_subquery",
    "q74_explode_array",
    "q75_stddev",
    "q76_regexp_extract",
    "q77_null_funcs",
    "q78_union_all_distinct_mix",
    "q82_tfidf",
    "q83_bm25",
    "q84_chunk",
    "q85_repetition",
    "q86_pack_sequences",
    "q87_quality_gate",
    "q88_decontaminate",
    "q89_domain_mix",
    "q90_token_entropy",
    "q97_bigram_perplexity",
]


def _rotate(front: list[str]) -> None:
    order = [q for q in front if q in QUERIES] + [
        q for q in QUERIES if q not in front
    ]
    for mapping in (QUERIES, ORACLES):
        rotated = {k: mapping[k] for k in order if k in mapping}
        mapping.clear()
        mapping.update(rotated)


_rotate(_NEVER_DRIVER_CHECKED)
