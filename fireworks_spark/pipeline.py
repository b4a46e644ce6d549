"""Fluent Pipe facade: the reference's user-facing composition surface
(pipes wrap pipes via ``input=``, reference fireworks/core/pipe.py and
fireworks/toolbox/pipes.py) re-expressed as method chaining over a lazy
DataFrame. Each method delegates to the operator library and returns a new
Pipe, so a reference pipeline like

    ShufflerPipe(input=RepeaterPipe(input=ds, num_repeats=3), seed=7)

reads here as

    Pipe(ds).repeat(3).shuffle(seed=7)

Nothing executes until an action (collect / batches / write) — the chain IS
the Catalyst logical plan, which is what makes the facade free: no
per-stage materialization, full pushdown/pruning across the whole chain.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame

from fireworks_spark.operators import toolbox


class Pipe:
    """Lazy chaining wrapper over a DataFrame (reference Pipe-graph parity).

    ``df`` is the underlying DataFrame at every step — drop to it freely
    with ``.df`` for anything the facade doesn't wrap.
    """

    def __init__(self, df: DataFrame):
        self.df = df

    # -- composition ----------------------------------------------------
    def apply(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipe":
        """HookedPassThroughPipe / FunctionPipe shape: arbitrary
        DataFrame -> DataFrame stage."""
        return Pipe(self.df.transform(fn))

    def __getitem__(self, cols) -> "Pipe":
        """Column projection (Message column indexing parity)."""
        if isinstance(cols, str):
            cols = [cols]
        return Pipe(self.df.select(*cols))

    # -- toolbox pipes ---------------------------------------------------
    def shuffle(self, seed: int | None = None) -> "Pipe":
        """ShufflerPipe (P10)."""
        return Pipe(toolbox.shuffle(self.df, seed=seed))

    def repeat(self, n: int, epoch_col: str | None = None) -> "Pipe":
        """RepeaterPipe (P9)."""
        return Pipe(toolbox.repeat(self.df, n, epoch_col=epoch_col))

    def label(self, title: str, labels_col: str = "labels") -> "Pipe":
        """Title2LabelPipe (P7)."""
        return Pipe(toolbox.with_label(self.df, title, labels_col))

    def label_index(self, col: str, index_col: str = "label_idx") -> "Pipe":
        """LabelerPipe index half (P8)."""
        return Pipe(toolbox.label_index(self.df, col, index_col))

    def standardize(self, cols: list[str]) -> "Pipe":
        """Normalizer apply (P21)."""
        return Pipe(toolbox.standardize(self.df, cols))

    def row_index(self, order_cols: list[str], index_col: str = "row_idx") -> "Pipe":
        """Global positional index (Message row semantics)."""
        return Pipe(toolbox.with_row_index(self.df, order_cols, index_col))

    def hstack(
        self,
        other: "Pipe | DataFrame",
        order_cols: list[str],
        other_order_cols: list[str] | None = None,
    ) -> "Pipe":
        """Positional horizontal concat (Message.merge)."""
        o = other.df if isinstance(other, Pipe) else other
        return Pipe(
            toolbox.hstack(self.df, o, order_cols, other_order_cols or order_cols)
        )

    def interleave(self, *others: "Pipe | DataFrame", order_cols: list[str]) -> "Pipe":
        """ClockworkHubJunction (P18): deterministic round-robin."""
        dfs = [self.df] + [o.df if isinstance(o, Pipe) else o for o in others]
        return Pipe(toolbox.interleave(dfs, order_cols))

    def split(
        self, key_col: str, test_fraction: float = 0.2, seed: int = 0
    ) -> tuple["Pipe", "Pipe"]:
        """train_test_split (P20), deterministic hash variant."""
        parts = toolbox.hash_split(
            self.df,
            {"train": 1.0 - test_fraction, "test": test_fraction},
            key_col,
            seed=seed,
        )
        return Pipe(parts["train"]), Pipe(parts["test"])

    # -- time-series / pipeline operators --------------------------------
    def asof_join(
        self,
        other: "Pipe | DataFrame",
        key_cols: list[str],
        ts_col: str,
        right_cols: list[str],
        direction: str = "backward",
        tolerance_micros: int | None = None,
    ) -> "Pipe":
        """Nearest-predecessor/successor join (operators/asof.py)."""
        from fireworks_spark.operators.asof import asof_join

        rhs = other.df if isinstance(other, Pipe) else other
        return Pipe(
            asof_join(
                self.df, rhs, key_cols, ts_col, right_cols,
                direction=direction, tolerance_micros=tolerance_micros,
            )
        )

    def interval_join(
        self,
        other: "Pipe | DataFrame",
        ts_col: str,
        start_col: str,
        end_col: str,
        keys: list[str] | None = None,
    ) -> "Pipe":
        """Point-in-interval join (operators/interval.py, bucketized)."""
        from fireworks_spark.operators.interval import interval_join

        rhs = other.df if isinstance(other, Pipe) else other
        return Pipe(
            interval_join(self.df, rhs, ts_col, start_col, end_col, keys=keys)
        )

    def time_rollup(
        self,
        ts_col: str,
        value_col: str,
        grains: tuple[str, ...] = ("hour", "day", "week"),
        keys: list[str] | None = None,
    ) -> "Pipe":
        """Multi-granularity rollup in one pass (operators/timeagg.py)."""
        from fireworks_spark.operators.timeagg import time_rollup

        return Pipe(
            time_rollup(self.df, ts_col, value_col, grains=grains, keys=keys)
        )

    def rebalance(self, stratum_col: str, key_col: str) -> "Pipe":
        """Uniform-mix deterministic downsampling (toolbox.rebalance_strata)."""
        return Pipe(toolbox.rebalance_strata(self.df, stratum_col, key_col))

    def heavy_hitters(self, key_col: str, capacity: int = 100) -> "Pipe":
        """Misra-Gries sketch + exact recount (operators/sketch.py)."""
        from fireworks_spark.operators.sketch import heavy_hitters_sketch

        return Pipe(heavy_hitters_sketch(self.df, key_col, capacity=capacity))

    def cache(self) -> "Pipe":
        """CachingPipe / MessageCache (P5/P6/P22): block-manager persist."""
        return Pipe(self.df.persist())

    # -- corpus operators -------------------------------------------------
    def dedup(
        self,
        threshold: float | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "Pipe":
        """Corpus dedup: exact (hash) when ``threshold`` is None, else
        MinHash-LSH near-dup at that Jaccard threshold keeping each
        cluster's minimum-id member (operators/dedup.py)."""
        from fireworks_spark.operators import dedup as dd

        if threshold is None:
            keep = dd.exact_dedup(
                self.df, id_col=id_col, text_col=text_col
            ).withColumnRenamed("keep_id", id_col)
            return Pipe(self.df.join(keep.select(id_col), id_col, "left_semi"))
        pairs = dd.minhash_dedup_pairs(
            self.df, threshold=threshold, id_col=id_col, text_col=text_col
        )
        return Pipe(dd.keep_canonical(self.df, pairs, id_col=id_col))

    def fuzzy_join(
        self,
        other: "Pipe | DataFrame",
        id_col: str,
        other_id_col: str,
        text_col: str,
        other_text_col: str,
        max_dist: int = 1,
    ) -> "Pipe":
        """Exact edit-distance join at radius 1 or 2 (operators/fuzzy.py
        deletion-neighborhood blocking) — dirty-to-canonical entity
        resolution."""
        from fireworks_spark.operators.fuzzy import fuzzy_join

        rhs = other.df if isinstance(other, Pipe) else other
        return Pipe(
            fuzzy_join(
                self.df, rhs, id_col, other_id_col, text_col,
                other_text_col, max_dist,
            )
        )

    def substring_dedup(
        self,
        k: int = 20,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "Pipe":
        """ExactSubstr removal: delete every token covered by a k-token
        window duplicating an earlier occurrence corpus-wide
        (dedup.substring_dedup)."""
        from fireworks_spark.operators import dedup as dd

        return Pipe(
            dd.substring_dedup(self.df, k=k, id_col=id_col, text_col=text_col)
        )

    def contamination(
        self,
        benchmark: "Pipe | DataFrame",
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 13,
        threshold: float = 0.8,
    ) -> "Pipe":
        """Graded n-gram contamination report — overlap fraction per doc
        plus a threshold verdict (dedup.contamination_report); the graded
        companion to :meth:`decontaminate`'s binary drop."""
        from fireworks_spark.operators import dedup as dd

        bench = benchmark.df if isinstance(benchmark, Pipe) else benchmark
        return Pipe(
            dd.contamination_report(
                self.df, bench, id_col=id_col, text_col=text_col,
                n=n, threshold=threshold,
            )
        )

    def media_dups(
        self,
        bin_col: str = "media",
        id_col: str = "doc_id",
        max_hamming: int = 8,
        num_bits: int = 48,
    ) -> "Pipe":
        """Near-duplicate media pairs via byte block hashing + banded
        Hamming search (multimodal.media_dup_pairs)."""
        from fireworks_spark.operators import multimodal

        return Pipe(
            multimodal.media_dup_pairs(
                self.df, bin_col, id_col, max_hamming, num_bits
            )
        )

    def quality(self, text_col: str = "text") -> "Pipe":
        """Quality-score columns (textstats.with_quality_score)."""
        from fireworks_spark.operators import textstats

        return Pipe(textstats.with_quality_score(self.df, text_col=text_col))

    def gopher(
        self, id_col: str = "doc_id", text_col: str = "text"
    ) -> "Pipe":
        """Gopher quality-rule statistics + pass verdict
        (textstats.gopher_stats)."""
        from fireworks_spark.operators import textstats

        return Pipe(textstats.gopher_stats(self.df, id_col, text_col))

    def clean_lines(
        self,
        min_words_per_line: int = 5,
        id_col: str = "doc_id",
        text_col: str = "text",
        **kw,
    ) -> "Pipe":
        """C4-style line-level cleaning (textstats.c4_line_filter)."""
        from fireworks_spark.operators import textstats

        return Pipe(
            textstats.c4_line_filter(
                self.df,
                id_col,
                text_col,
                min_words_per_line=min_words_per_line,
                **kw,
            )
        )

    def repetition(
        self, id_col: str = "doc_id", text_col: str = "text"
    ) -> "Pipe":
        """Full Gopher n-gram repetition rules (ranking.ngram_repetition)."""
        from fireworks_spark.operators import ranking

        return Pipe(ranking.ngram_repetition(self.df, id_col, text_col))

    def funnel(
        self,
        steps: list[str],
        key_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
    ) -> "Pipe":
        """Ordered event-funnel reach (timeagg.funnel_counts)."""
        from fireworks_spark.operators.timeagg import funnel_counts

        return Pipe(
            funnel_counts(self.df, steps, key_col, ts_col, type_col)
        )

    def retention(
        self,
        key_col: str = "user_id",
        ts_col: str = "ts",
        period: str = "week",
    ) -> "Pipe":
        """Cohort retention matrix (timeagg.retention_cohorts)."""
        from fireworks_spark.operators.timeagg import retention_cohorts

        return Pipe(retention_cohorts(self.df, key_col, ts_col, period))

    def similar_join(
        self,
        other: "Pipe | DataFrame",
        threshold: float = 0.8,
        id_col: str = "doc_id",
        text_col: str = "text",
        exact: bool = False,
    ) -> "Pipe":
        """Cross-corpus near-dup join at a Jaccard threshold: banded
        MinHash candidates + exact verify (dedup.minhash_join) by
        default; ``exact=True`` switches to the df-capped shingle
        candidate join (dedup.jaccard_join) for verification-grade runs."""
        from fireworks_spark.operators import dedup as dd

        rhs = other.df if isinstance(other, Pipe) else other
        fn = dd.jaccard_join if exact else dd.minhash_join
        return Pipe(
            fn(self.df, rhs, threshold, id_col=id_col, text_col=text_col)
        )

    def histogram(
        self, col: str, nbins: int = 10, by: str | None = None
    ) -> "Pipe":
        """Equi-width histogram (toolbox.histogram)."""
        return Pipe(toolbox.histogram(self.df, col, nbins=nbins, by=by))

    def temperature_mix(
        self, stratum_col: str = "source", alpha: float = 0.5
    ) -> "Pipe":
        """Alpha-temperature domain rebalancing (toolbox.temperature_mix)."""
        return Pipe(toolbox.temperature_mix(self.df, stratum_col, alpha))

    def negatives(self, k: int = 4, id_col: str = "doc_id") -> "Pipe":
        """Deterministic contrastive negative sampling
        (mlfeed.negative_samples)."""
        from fireworks_spark import mlfeed

        return Pipe(mlfeed.negative_samples(self.df, k=k, id_col=id_col))

    def decontaminate(
        self,
        benchmark: "Pipe | DataFrame",
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        bloom: bool = True,
    ) -> "Pipe":
        """Drop docs sharing a word n-gram with the benchmark. ``bloom``
        (default) probes a fixed 16 KiB bitset at the scan before the
        exact verify (dedup.bloom_decontaminate) — same result, no
        benchmark-sized broadcast."""
        from fireworks_spark.operators import dedup as dd

        bench = benchmark.df if isinstance(benchmark, Pipe) else benchmark
        fn = dd.bloom_decontaminate if bloom else dd.decontaminate
        return Pipe(fn(self.df, bench, id_col=id_col, text_col=text_col, n=n))

    def weighted_sample(
        self,
        weight_col: str,
        k: int,
        key_col: str = "doc_id",
        group_col: str | None = None,
        seed: int = 7,
    ) -> "Pipe":
        """Deterministic weighted sampling without replacement
        (toolbox.weighted_sample, Efraimidis-Spirakis)."""
        return Pipe(
            toolbox.weighted_sample(
                self.df, weight_col, k, key_col=key_col,
                group_col=group_col, seed=seed,
            )
        )

    def token_budget(
        self,
        token_col: str,
        budget: int,
        key_col: str = "doc_id",
        group_col: str | None = None,
        seed: int = 11,
    ) -> "Pipe":
        """Keyed-random prefix within a (per-group) token budget
        (toolbox.token_budget_sample)."""
        return Pipe(
            toolbox.token_budget_sample(
                self.df, token_col, budget, key_col=key_col,
                group_col=group_col, seed=seed,
            )
        )

    # -- formats (Message.read / Message.to parity) -----------------------
    @classmethod
    def read(cls, spark, fmt: str, path: str = None, **kw) -> "Pipe":
        """Message.read: any reference format name (edge_formats
        dispatch — spark-native, file-parallel connector, or a recorded
        refusal)."""
        from fireworks_spark.edge_formats import message_read

        return cls(message_read(spark, fmt, path, **kw))

    def to(self, fmt: str, path: str = None, **kw):
        """Message.to: distributed formats write to ``path`` and return
        None; edge renders (dict/records/string/latex) return the value."""
        from fireworks_spark.edge_formats import message_to

        return message_to(self.df, fmt, path, **kw)

    # -- feed / actions --------------------------------------------------
    def batches(self, batch_size: int, drop_tail: bool = True) -> Iterator:
        """BatchingPipe (P12): driver-side pandas batch iterator."""
        from fireworks_spark.mlfeed import batch_iterator

        return batch_iterator(self.df, batch_size, drop_tail=drop_tail)

    def collect(self):
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()
