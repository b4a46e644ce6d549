"""Experiment/Scaffold/Factory round-trips (reference experiment_test.py:
21-127, factory_test.py:46-90 behavior) and closed-form attribution checks
(reference explain_test.py:171-428)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fireworks_spark import explain
from fireworks_spark.experiment import (
    EndHyperparameterOptimization,
    Experiment,
    Factory,
    Scaffold,
)
from fireworks_spark.mlfeed import LinearModel


def test_experiment_dirs_increment_and_roundtrip(spark, tmp_path):
    e0 = Experiment("run", str(tmp_path), spark)
    e1 = Experiment("run", str(tmp_path), spark)
    assert e0.path.endswith("run_0") and e1.path.endswith("run_1")
    e0.log_params({"lr": 0.1, "layers": 2}, trial=0)
    e0.log_metrics({"loss": 1.5}, trial=0, step=0)
    e0.log_metrics({"loss": 0.7}, trial=0, step=1)
    p = e0.params_df().collect()[0]
    assert p.lr == 0.1 and p.layers == 2
    losses = sorted(r.loss for r in e0.metrics_df().collect())
    assert losses == [0.7, 1.5]


def test_scaffold_save_load(tmp_path):
    class Comp:
        def __init__(self):
            self.state = {"mu": 1.0}

        def get_state(self):
            return self.state

        def set_state(self, s):
            self.state = s

    c, d = Comp(), {"k": 5}
    sc = Scaffold()
    sc.attach("norm", c)
    sc.attach("cfg", d)
    sc.save(str(tmp_path / "st"))
    c.state = {"mu": -9.0}
    d["k"] = 0
    sc.load(str(tmp_path / "st"))
    assert c.state == {"mu": 1.0}
    assert d == {"k": 5}


def test_factory_loop_and_best(spark, tmp_path):
    exp = Experiment("hp", str(tmp_path), spark)

    def parameterizer(trials):
        if len(trials) >= 4:
            raise EndHyperparameterOptimization
        return {"lr": 10.0 ** -(len(trials) + 1)}

    def trainer(params):
        return params["lr"]  # "model" = the lr itself

    def evaluator(model, params):
        return {"loss": (model - 0.01) ** 2}  # optimum at lr=0.01

    f = Factory(trainer, evaluator, parameterizer, experiment=exp)
    trials = f.run()
    assert len(trials) == 4
    best_params, best_metrics = f.best("loss")
    assert best_params["lr"] == 0.01 and best_metrics["loss"] == 0.0
    assert exp.metrics_df().count() == 4


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(i, [float(i + 1), float(-i), 2.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )


def test_gradient_x_input_closed_form(vecs):
    w = [0.5, -1.0, 2.0]
    m = LinearModel(w, bias=3.0)
    rows = explain.gradient_x_input(m, vecs).collect()
    for r in rows:
        x = [r.vec_id + 1.0, -float(r.vec_id), 2.0]
        assert r.attribution == pytest.approx([wi * xi for wi, xi in zip(w, x)])


def test_integrated_gradients_exact_for_affine(vecs):
    w = [0.5, -1.0, 2.0]
    m = LinearModel(w, bias=3.0)
    for steps in (1, 7):
        rows = explain.integrated_gradients(m, vecs, baseline=0.5, steps=steps).collect()
        for r in rows:
            x = [r.vec_id + 1.0, -float(r.vec_id), 2.0]
            want = [wi * (xi - 0.5) for wi, xi in zip(w, x)]
            assert r.attribution == pytest.approx(want), f"steps={steps}"


def test_occlusion_closed_form(vecs):
    w = [0.5, -1.0, 2.0]
    m = LinearModel(w, bias=3.0)
    rows = explain.occlusion(m, vecs, baseline=0.0).collect()
    for r in rows:
        x = [r.vec_id + 1.0, -float(r.vec_id), 2.0]
        assert r.attribution == pytest.approx([wi * xi for wi, xi in zip(w, x)])


def test_attribution_completeness(vecs):
    """IG completeness axiom: sum(attributions) == f(x) - f(baseline)."""
    w = [0.5, -1.0, 2.0]
    m = LinearModel(w, bias=3.0)
    ig = {r.vec_id: r.attribution for r in explain.integrated_gradients(
        m, vecs, baseline=0.0, steps=4).collect()}
    for i, att in ig.items():
        x = np.array([i + 1.0, -float(i), 2.0])
        fx = float(x @ np.array(w) + 3.0)
        f0 = 3.0
        assert sum(att) == pytest.approx(fx - f0)


def test_ab_metrics_closed_form(spark):
    """Hand-computed Welch t: control [1,2,3], treatment [2,4,6] ->
    lift 2.0, t = 2 / sqrt(1/3 + 4/3)."""
    import math

    from fireworks_spark.experiment import ab_metrics

    rows = [(0, 1.0), (0, 2.0), (0, 3.0), (1, 2.0), (1, 4.0), (1, 6.0)]
    df = spark.createDataFrame(rows, "bucket int, value double")
    r = ab_metrics(df, "bucket", "value").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.mean_a == 2.0 and r.mean_b == 4.0 and r.lift == 2.0
    want_t = 2.0 / math.sqrt(1.0 / 3 + 4.0 / 3)
    assert abs(r.t_welch - want_t) < 1e-4

    grouped = ab_metrics(
        spark.createDataFrame(
            [("g1", 0, 1.0), ("g1", 1, 5.0), ("g2", 0, 2.0), ("g2", 1, 2.0)],
            "g string, bucket int, value double",
        ),
        "bucket",
        "value",
        group_col="g",
    ).collect()
    got = {r.g: (r.n_a, r.n_b, r.lift) for r in grouped}
    assert got == {"g1": (1, 1, 4.0), "g2": (1, 1, 0.0)}
