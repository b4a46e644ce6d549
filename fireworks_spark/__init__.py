"""fireworks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kellylab/Fireworks (see SURVEY.md).

Not a port: the reference's eager Pipe graph (reference:
fireworks/core/pipe.py:34-212) is replaced by Spark's lazy DataFrame DAG;
its Message data model (fireworks/core/message.py:21-116) maps onto a single
DataFrame schema mixing scalar and ArrayType columns.

Public surface (see COVERAGE.md for the reference-item map):

- session/get_spark, tables — session factory + test-table loaders
- operators.toolbox — shuffle/repeat/splits/interleave/label/standardize/
  salted_join/stratified_sample/index_map/apply_embeddings/with_row_index/
  hstack/profile/heavy_hitters/winsorize
- operators.dedup / similarity / textstats / multimodal — the LLM-pipeline
  operator families (incl. dup_clusters/keep_canonical, line_dedup,
  semdedup, decontaminate, mask_pii, extract_urls, remove_stopwords,
  strip_markup)
- operators.ranking — TF-IDF, BM25, token chunking, repetition stats,
  sequence packing, token entropy, DSIR importance weights
- operators.embedstats — embedding covariance matrix, PCA fit/projection
- operators.bpe — BPE tokenizer training + subword encoding
- operators.asof / operators.interval — as-of and range/interval joins
- pipeline.Pipe — the reference's fluent chaining surface over all of the
  above
- mlfeed — Arrow-batched model stages, Model/LinearModel, batch_iterator,
  fit_linear, Metrics
- streaming — event-time windows, StreamingNormalizer, stateful operators,
  bounded-state exact and minhash near-dup stream dedup
- database — Table binding + delete/update/upsert rewrites, compact, DDL,
  JDBC
- experiment — Experiment/Scaffold/Factory
- explain — attribution (Gradient*Input / IntegratedGradients / Occlusion)
- sources — FASTA reader; io_formats — format round-trips, partitioned and
  bucketed writes (shuffle-free co-located joins), Z-order clustering
- registry — every declared query + its DuckDB oracle
"""

from fireworks_spark.session import get_spark
from fireworks_spark.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.2.0"
