"""Model attribution — P30 (reference fireworks/extensions/explain.py:10-178:
GradientxInput, IntegratedGradients, Occlusion_1).

The reference computes attributions with torch autograd on one process.
Here each method is a ``mapInPandas`` stage — attribution is embarrassingly
parallel over rows, so it scales with executors — and the gradient comes
from the model:

- models exposing ``gradients(X) -> (n, d)`` (LinearModel: the constant w)
  use exact gradients;
- any other batch scorer falls back to central finite differences
  (torch-free, 2d forward passes per row — fine for the narrow feature
  vectors attribution is used on).

For affine models every method below has a closed form
(gx = w*x, ig = w*(x - baseline), occlusion_j = w_j*(x_j - b_j));
tests/test_explain.py asserts exact agreement, mirroring the reference's
closed-form tests (explain_test.py:171-428).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from fireworks_spark.mlfeed import LinearModel, Model


def _score_fn(model: Model):
    if isinstance(model, LinearModel):
        w = model.params["w"]
        b = model.params["b"]
        return lambda X: X @ w + b
    raise TypeError(
        "explain needs a model with a vectorized score; wrap yours as a "
        "Model with params or pass a LinearModel"
    )


def _grad_fn(model: Model):
    if isinstance(model, LinearModel):
        w = model.params["w"]
        return lambda X: np.broadcast_to(w, X.shape)
    score = _score_fn(model)

    def fd(X: np.ndarray, eps: float = 1e-5) -> np.ndarray:
        G = np.empty_like(X)
        for j in range(X.shape[1]):
            up, dn = X.copy(), X.copy()
            up[:, j] += eps
            dn[:, j] -= eps
            G[:, j] = (score(up) - score(dn)) / (2 * eps)
        return G

    return fd


def _attr_stage(df: DataFrame, id_col: str, vec_col: str, fn) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            X = (
                np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
                if len(b)
                else np.zeros((0, 1))
            )
            A = fn(X)
            yield pd.DataFrame(
                {id_col: b[id_col].to_numpy(), "attribution": list(A)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, attribution array<double>"
    )


def gradient_x_input(
    model: Model, df: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Gradient*Input (reference explain.py:10-46): per-feature d(score)/dx
    scaled by the input value."""
    grad = _grad_fn(model)
    return _attr_stage(df, id_col, vec_col, lambda X: grad(X) * X)


def integrated_gradients(
    model: Model,
    df: DataFrame,
    baseline: float = 0.0,
    steps: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IntegratedGradients (reference explain.py:48-112): average gradient
    along the straight path from baseline to x, times (x - baseline).
    Exact (any steps) for affine models; Riemann-midpoint otherwise."""
    grad = _grad_fn(model)

    def ig(X: np.ndarray) -> np.ndarray:
        B = np.full_like(X, baseline)
        total = np.zeros_like(X)
        for s in range(steps):
            alpha = (s + 0.5) / steps
            total += grad(B + alpha * (X - B))
        return (X - B) * total / steps

    return _attr_stage(df, id_col, vec_col, ig)


def occlusion(
    model: Model,
    df: DataFrame,
    baseline: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Occlusion (reference explain.py:133-178): score drop when feature j
    is replaced by the baseline — d+1 forward passes per batch, model-
    agnostic (no gradients required)."""
    score = _score_fn(model)

    def occ(X: np.ndarray) -> np.ndarray:
        base_scores = score(X)
        A = np.empty_like(X)
        for j in range(X.shape[1]):
            Xo = X.copy()
            Xo[:, j] = baseline
            A[:, j] = base_scores - score(Xo)
        return A

    return _attr_stage(df, id_col, vec_col, occ)
