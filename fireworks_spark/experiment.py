"""Experiment tracking, pipeline state save/load, hyperparameter search —
P26-P28 (reference fireworks/extensions/experiment.py:35-163,
core/scaffold.py:4-117, extensions/factory.py:22-146).

The reference stores run metadata in per-run sqlite files and saves pipeline
state through a Scaffold of attached components. Spark-first: a run is a
directory; params/metrics are parquet tables (queryable with the same
engine that runs the pipelines — no second storage system); component state
is JSON. The Factory loop is driver-side control flow by design (so was the
reference's); each trial's heavy lifting is whatever Spark jobs the trainer
launches, and trials append to the experiment's metrics table.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class Experiment:
    """Run-scoped directory + parquet metadata tables (reference
    Experiment: experiment.py:35-163 — directory per run, engines for
    metadata, file factory). ``name`` collisions auto-increment, matching
    the reference's save_path indexing."""

    def __init__(self, name: str, root: str, spark: SparkSession,
                 description: str = ""):
        self.spark = spark
        i = 0
        while os.path.exists(os.path.join(root, f"{name}_{i}")):
            i += 1
        self.path = os.path.join(root, f"{name}_{i}")
        os.makedirs(self.path)
        self.name = name
        self.run_index = i
        meta = {"name": name, "iteration": i, "description": description}
        with open(os.path.join(self.path, "metadata.json"), "w") as f:
            json.dump(meta, f)

    # -- file factory (reference open_file/engine accessors) ---------------

    def file_path(self, filename: str) -> str:
        """Path inside the run directory (reference's open() file factory)."""
        return os.path.join(self.path, filename)

    # -- metadata tables ---------------------------------------------------

    def _append(self, table: str, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [(json.dumps(r),) for r in rows], "payload string"
        )
        df.write.mode("append").parquet(self.file_path(table))

    def log_params(self, params: dict[str, Any], trial: int = 0) -> None:
        self._append("params", [{"trial": trial, **params}])

    def log_metrics(self, metrics: dict[str, Any], trial: int = 0,
                    step: int = 0) -> None:
        self._append("metrics", [{"trial": trial, "step": step, **metrics}])

    def _read(self, table: str) -> DataFrame:
        # Parse payloads executor-side: spark.read.json over the payload
        # strings does distributed schema inference (union of keys across
        # trials, deterministic alphabetical field order) — the driver never
        # materializes the rows, so a million-trial metrics table reads the
        # same way a ten-trial one does.
        raw = self.spark.read.parquet(self.file_path(table))
        return self.spark.read.json(raw.rdd.map(lambda r: r.payload))

    def params_df(self) -> DataFrame:
        return self._read("params")

    def metrics_df(self) -> DataFrame:
        return self._read("metrics")


class Scaffold:
    """Whole-pipeline state save/load (reference Scaffold,
    scaffold.py:4-117): attach named components, serialize each to the
    target directory, restore in place. A component is anything exposing
    ``get_state() -> dict`` / ``set_state(dict)`` (the reference's Pipe
    protocol) or a plain dict."""

    def __init__(self):
        self.components: dict[str, Any] = {}

    def attach(self, name: str, obj: Any) -> None:
        self.components[name] = obj

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        for name, obj in self.components.items():
            state = obj.get_state() if hasattr(obj, "get_state") else dict(obj)
            with open(os.path.join(path, f"{name}.json"), "w") as f:
                json.dump(state, f)

    def load(self, path: str) -> None:
        for name, obj in self.components.items():
            fp = os.path.join(path, f"{name}.json")
            with open(fp) as f:
                state = json.load(f)
            if hasattr(obj, "set_state"):
                obj.set_state(state)
            else:
                obj.clear()
                obj.update(state)


class EndHyperparameterOptimization(StopIteration):
    """Raised by a parameterizer to end the search (reference
    factory.py:16-20)."""


class Factory:
    """Hyperparameter-search driver loop (reference Factory,
    factory.py:22-146): parameterizer proposes params (sees all past
    trials), trainer produces a model/result, evaluator scores it; every
    trial is logged to the experiment. Stops when the parameterizer raises
    EndHyperparameterOptimization."""

    def __init__(
        self,
        trainer: Callable[[dict], Any],
        evaluator: Callable[[Any, dict], dict],
        parameterizer: Callable[[list[tuple[dict, dict]]], dict],
        experiment: Experiment | None = None,
    ):
        self.trainer = trainer
        self.evaluator = evaluator
        self.parameterizer = parameterizer
        self.experiment = experiment
        self.trials: list[tuple[dict, dict]] = []  # (params, metrics)

    def run(self, max_trials: int = 1000) -> list[tuple[dict, dict]]:
        for t in range(max_trials):
            try:
                params = self.parameterizer(self.trials)
            except EndHyperparameterOptimization:
                break
            result = self.trainer(params)
            metrics = self.evaluator(result, params)
            self.trials.append((params, metrics))
            if self.experiment is not None:
                self.experiment.log_params(params, trial=t)
                self.experiment.log_metrics(metrics, trial=t)
        return self.trials

    def best(self, metric: str, minimize: bool = True) -> tuple[dict, dict]:
        key = lambda pm: pm[1][metric]  # noqa: E731
        return (min if minimize else max)(self.trials, key=key)


def ab_metrics(
    df,
    bucket_col: str,
    metric_col: str,
    group_col: str | None = None,
    round_to: int = 4,
):
    """A/B experiment readout at corpus scale: per ``group_col`` (or one
    global row), sample sizes, means, the mean lift (B - A) and Welch's
    t statistic between bucket 0 (control) and bucket 1 (treatment) of
    ``bucket_col``. The deterministic assignment itself is the caller's
    (toolbox.hash_split / key mod 2 — never randomSplit, whose buckets
    depend on partition layout).

    ONE conditional aggregation pass — count/avg/var_samp over
    when(bucket=...) — so no pivot and no second scan; the shuffle is
    bounded by |groups|. Floats round to ``round_to`` on both engines
    (COVERAGE rounding convention 1: raw aggregate values)."""
    from pyspark.sql import functions as F

    b = F.col(bucket_col)
    x = F.col(metric_col).cast("double")
    ca = F.when(b == 0, x)
    cb = F.when(b == 1, x)
    aggs = [
        F.count(ca).alias("n_a"),
        F.count(cb).alias("n_b"),
        F.avg(ca).alias("_ma"),
        F.avg(cb).alias("_mb"),
        F.var_samp(ca).alias("_va"),
        F.var_samp(cb).alias("_vb"),
    ]
    base = (
        df.groupBy(group_col).agg(*aggs)
        if group_col
        else df.groupBy().agg(*aggs)
    )
    t_stat = (F.col("_mb") - F.col("_ma")) / F.sqrt(
        F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b")
    )
    out = base.select(
        *([group_col] if group_col else []),
        "n_a",
        "n_b",
        F.round("_ma", round_to).alias("mean_a"),
        F.round("_mb", round_to).alias("mean_b"),
        F.round(F.col("_mb") - F.col("_ma"), round_to).alias("lift"),
        F.round(t_stat, round_to).alias("t_welch"),
    )
    return out.orderBy(group_col) if group_col else out
