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
# Driver-check rotation. The correctness driver walks the first ~50 registry
# entries in insertion order. Rounds 1-4 have driver-green rows for every
# oracle-backed query EXCEPT the 12 leading this list; after they get a
# driver row this round, coverage is complete and this block collapses to a
# round-robin of sentinels. The rows-only (no-SQL-oracle) queries follow so
# the driver keeps recording their row counts, then one known-green sentinel
# per query family as regression canaries inside the check window.
_DRIVER_FRONT = [
    # --- never driver-checked (positions 51-62 of the round-4 order) ---
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
    # --- newly oracle-backed approx ops (value-checked as of r5) ---
    "q33_dedup_simhash",
    "q36_ann_ivf_topk",
    "q102_ann_lsh_topk",
    # --- new this round (never driver-checked yet) ---
    "q116_stata_roundtrip",
    "q117_html_roundtrip",
    "q118_transaction_semantics",
    "q119_pq_adc_topk",
    "q120_hybrid_rrf",
    "q121_fasta_roundtrip",
    "q122_fastq_roundtrip",
    "q123_orc_roundtrip",
    "q124_csv_roundtrip",
    "q125_genbank_roundtrip",
    "q126_json_roundtrip",
    "q127_fuzzy_join",
    "q128_ivfpq_topk",
    "q129_bloom_decontaminate",
    "q130_weighted_sample",
    "q131_token_budget_sample",
    "q132_histogram",
    "q133_excel_roundtrip",
    "q134_jaccard_join",
    "q135_minhash_join",
    "q136_hashed_score",
    "q137_url_canonicalize",
    "q138_pretraining_mix",
    "q139_temperature_mix",
    "q140_negative_samples",
    "q141_msgpack_roundtrip",
    "q142_domain_overlap",
    # --- rows-only by design (approx/iterative; r4-checked) ---
    "q103_semdedup",
    "q106_pca_project",
    "q107_bpe_merges",
    "q108_bpe_encode",
    # --- known-green sentinels, one per family (regression canaries) ---
    "q01_scan_projection",        # relational Q1-Q28
    "q16_intersect",         # multi-result relational
    "q70_lag_lead",               # window functions
    "q71_cube",                   # cube/rollup
    "q72_percentile",             # exact percentiles
    "q73_exists_subquery",        # subqueries
    "q74_explode_array",          # UDTF/explode
    "q75_stddev",                 # stats aggs
    "q76_regexp_extract",         # string/regexp
    "q79_session_windows",        # sessionization
    "q80_grouping_sets",          # grouping sets
    "q92_approx_percentile",      # approx aggs
    "q29_asof_join",              # time-series asof (r5: payload-struct fix)
    "q81_interval_join",          # interval join
    "q91_rolling_time_window",    # rolling RANGE frames
    "q96_cogroup_asof",           # cogrouped Arrow
    "q111_time_rollup",           # multi-grain rollup
    "q68_stream_tumbling",        # streaming tumbling
    "q69_stream_sliding",         # streaming sliding
    "q30_dedup_exact",            # dedup family
    "q31_dedup_ngram_jaccard",    # jaccard pairs (r5: unpersist path)
    "q32_dedup_minhash_lsh",      # minhash LSH
    "q34_dedup_embedding_cosine",        # embedding near-dup
    "q42_dup_clusters",           # connected components
    "q115_leakage_safe_split",    # leakage-safe split
    "q35_ann_cosine_topk",         # ANN brute force
    "q37_text_token_stats",             # text stats family
    "q104_dsir_weights",          # ranking family
    "q112_mg_heavy_hitters",      # sketch (r5: null-key fix)
    "q113_rebalance_strata",      # rebalance
    "q114_feather_roundtrip",     # Arrow IPC connector (r5: streamed writer)
    "q63_linear_score",           # mlfeed/model
    "q65_grouped_normalize",      # applyInPandas
    "q66_media_meta",             # multimodal
    "q95_salted_join",            # skew handling
    "q60_delete_semantics",       # database mutations
    "q54_label_onehot",           # toolbox/labeling
    "q50_shuffle_permutation",    # shuffle/repeat
]


def _rotate(front: list[str]) -> None:
    missing = [q for q in front if q not in QUERIES]
    if missing:  # a typo here silently shrinks the driver check window
        raise KeyError(f"_DRIVER_FRONT names not in QUERIES: {missing}")
    order = list(front) + [q for q in QUERIES if q not in front]
    for mapping in (QUERIES, ORACLES):
        rotated = {k: mapping[k] for k in order if k in mapping}
        mapping.clear()
        mapping.update(rotated)


_rotate(_DRIVER_FRONT)
