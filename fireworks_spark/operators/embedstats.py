"""Embedding-column statistics: covariance matrix and PCA projection —
the whitening/dimensionality-reduction preprocessing of an embedding-based
training-data pipeline (feeds SemDeDup/ANN; reference analog: the
Normalizer/preprocessing pipes of fireworks/toolbox/preprocessing.py:14-109
lifted from scalar columns to vector columns).

Scale notes (100 TB):
- ``covariance_matrix`` is one generate-then-aggregate pipeline, entirely
  JVM-side: each row streams its dim^2 (i, j, x_i*x_j) triples through
  whole-stage codegen into a partial HashAggregate, so every task emits at
  most dim^2 partial rows (4096 at dim=64) regardless of row count — the
  classic map-side outer-product accumulation, with the final shuffle
  bounded by dim^2 groups. No Python, no driver state.
- ``pca_project`` collects only the dim x dim covariance (tiny, constant
  in N), eigendecomposes on the driver, and projects with one Arrow
  matmul pass — same shape as similarity.ivf_topk's assignment stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fireworks_spark.operators.spread import spread

__all__ = ["covariance_matrix", "pca_fit", "pca_project", "pca_whiten"]


def _cov_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Shared sufficient-statistics aggregate for covariance AND mean:
    (i, j, sum(x_i*x_j), sum(x_i), sum(x_j), n) per dimension pair.

    Each Arrow batch is reduced to ONE dim x dim partial (a BLAS X'X plus a
    column sum) before anything moves — the classic map-side outer-product
    accumulation, so the shuffle carries dim^2 rows per batch regardless of
    row count, and the only aggregation is a dim^2-group sum. (An
    interpreted HOF-triple formulation of the same plan measured 5x slower
    per row: building 4096 structs per row in the codegen interpreter costs
    more than the matmul it feeds.)"""
    import numpy as np
    import pandas as pd

    base = (
        spread(df)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .filter(F.col("v").isNotNull())
    )

    def _partials(batches):
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in b["v"]])
            dim = X.shape[1]
            S = X.T @ X
            s = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.repeat(np.arange(dim, dtype=np.int32), dim),
                    "j": np.tile(np.arange(dim, dtype=np.int32), dim),
                    "sp": S.ravel(),
                    "si": np.repeat(s, dim),
                    "sj": np.tile(s, dim),
                    "n": np.int64(len(X)),
                }
            )

    part = base.mapInPandas(
        _partials, "i int, j int, sp double, si double, sj double, n long"
    )
    return part.groupBy("i", "j").agg(
        F.sum("sp").alias("sp"),
        F.sum("si").alias("si"),
        F.sum("sj").alias("sj"),
        F.sum("n").alias("n"),
    )


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", round_to: int | None = 4
) -> DataFrame:
    """Population covariance of a vector column as (i, j, cov) rows,
    0-based indices, cov = E[x_i x_j] - E[x_i] E[x_j]. One corpus scan
    (see :func:`_cov_partials`)."""
    agg = _cov_partials(df, vec_col)
    n = F.col("n").cast("double")
    cov = F.col("sp") / n - (F.col("si") / n) * (F.col("sj") / n)
    if round_to is not None:
        cov = F.round(cov, round_to) + F.lit(0.0)
    return agg.select("i", "j", cov.alias("cov"))


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding"):
    """Top-k principal components from the distributed covariance (only
    dim^2 rows ever reach the driver). Returns (components [k, dim] with a
    deterministic sign convention, mean [dim], explained_variance [k]).

    ONE corpus scan: the covariance partials already carry sum(x_i) and n
    per (i, j) group, so the per-dimension mean is si/n off the same
    aggregate — no second pass."""
    import numpy as np

    rows = _cov_partials(df, vec_col).collect()
    dim = max(r["i"] for r in rows) + 1
    C = np.zeros((dim, dim))
    mean = np.zeros(dim)
    for r in rows:
        n = float(r["n"])
        C[r["i"], r["j"]] = r["sp"] / n - (r["si"] / n) * (r["sj"] / n)
        mean[r["i"]] = r["si"] / n
    w, V = np.linalg.eigh((C + C.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T
    # deterministic sign: largest-|coefficient| entry of each component >= 0
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1.0
    return comps, mean, w[order]


def pca_project(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    components=None,
) -> DataFrame:
    """Project every vector onto the top-k principal components (mean-
    centered). Returns (id_col, pc array<double> of length k).

    ``components`` (optional, [k, dim]) injects a fixed basis in place of
    the learned eigenvectors — the ivf_topk-style injection that makes the
    mean-center + matmul + round pass SQL-derivable so the correctness
    driver value-checks the projection machinery end-to-end (the learned
    eig path stays covered by the local reconstruction tests). With an
    injected basis only the per-dimension mean is computed from data, via
    one JVM posexplode aggregate (dim rows to the driver, not dim^2)."""
    import numpy as np
    import pandas as pd

    if components is not None:
        comps = np.asarray(components, dtype=np.float64)
        mean_rows = (
            df.select(
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "d", "x"
                )
            )
            .groupBy("d")
            .agg(F.avg("x").alias("mx"))
            .collect()
        )
        mean = np.zeros(comps.shape[1])
        for r in mean_rows:
            mean[r["d"]] = r["mx"]
    else:
        comps, mean, _ = pca_fit(df, k, vec_col)

    def _proj(batches):
        scale = 10.0**round_to
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in b["nv"]])
            # explicit floor(x*s + 0.5)/s instead of np.round: half-even
            # np.round vs SQL half-away ROUND diverge on exact half-way
            # doubles; this formula is a single IEEE expression any oracle
            # engine reproduces bit-identically (the q149 rounding class)
            P = np.floor((X - mean) @ comps.T * scale + 0.5) / scale + 0.0
            yield pd.DataFrame({"nid": b["nid"], "pc": list(P)})

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
        .mapInPandas(_proj, "nid long, pc array<double>")
        .select(F.col("nid").alias(id_col), "pc")
    )


def pca_whiten(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    components=None,
    variances=None,
    eps: float = 1e-8,
) -> DataFrame:
    """PCA whitening: mean-center, rotate onto the top-k components, and
    scale each coordinate by 1/sqrt(variance + eps) so the output has
    identity covariance — the standard embedding preprocessing before
    cosine-threshold dedup (SemDeDup-style) or Mahalanobis-ish scoring,
    composing pca_fit/pca_project's verified machinery. Returns
    (id_col, wpc array<double> of length k).

    ``components``/``variances`` inject a fixed basis + per-component
    variances (the pca_project injection shape), making the whole
    center->rotate->scale->round pass SQL-derivable for the driver; when
    omitted both are learned from the covariance eig. The scale factors
    fold INTO the projection matrix before the single Arrow matmul, so
    whiten costs exactly what project costs; rounding stays the portable
    floor(x*1e4+0.5)/1e4 convention."""
    import numpy as np

    if (components is None) != (variances is None):
        raise ValueError("inject components and variances together")
    if components is None:
        comps, _mean, eig = pca_fit(df, k, vec_col)
        variances = eig
    else:
        comps = np.asarray(components, dtype=np.float64)
    w = np.asarray(variances, dtype=np.float64)
    scaled = comps / np.sqrt(w + eps)[:, None]
    return pca_project(
        df, k, id_col, vec_col, round_to, components=scaled
    ).withColumnRenamed("pc", "wpc")
