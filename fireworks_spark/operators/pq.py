"""Product quantization (PQ) for embedding columns — the memory-bound scale
path for similarity search (Jégou et al., "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011; the FAISS IndexPQ / IndexIVFPQ shape).

Why it matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ
code with m=8 subspaces x 8 bits is 8 bytes — a 32x cut. The ADC
(asymmetric distance computation) scan never touches raw vectors: each
query precomputes an m x K lookup table of subspace distances, and a base
row's approximate distance is m table lookups summed. Here that scan is
PURE JVM (zip_with + aggregate over the code array against a broadcast
LUT), so the big side stays whole-stage-codegen'd — Python appears only in
the one-time, Arrow-batched encode pass and the tiny per-query LUT build.

Division of labor with the other ANN operators (operators/similarity.py):
IVF bounds *which rows* a query scans (nprobe/nlist of the data); PQ bounds
*bytes per row*. ``ivfpq_topk`` composes both, FAISS-style (the
by_residual=False variant: codes quantize raw vectors, not residuals —
one shared codebook, simpler distributed encode; the residual variant needs
per-cell re-encoding on cell reassignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _kmeans(X, k: int, seed: int, iters: int = 25):
    """Deterministic euclidean k-means (k-means++ init from rng(seed)) on an
    in-memory sample — PQ codebooks train per subspace on a bounded sample
    for the same reason the IVF quantizer does (similarity.py:108): the
    codebook, not the fit set, defines the index. Returns (k, dsub)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in C], axis=0
        ).clip(min=0.0)
        total = d2.sum()
        C.append(
            X[rng.integers(len(X))]
            if total <= 0
            else X[rng.choice(len(X), p=d2 / total)]
        )
    C = np.stack(C)
    prev = None
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        if prev is not None and np.array_equal(a, prev):
            break
        prev = a
        for j in range(k):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def pq_train(
    base: DataFrame,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = 100_000,
):
    """Train PQ codebooks: split the vector into ``m`` contiguous subspaces
    and run k-means with K=2^nbits centroids in each, all on one bounded
    driver sample (one collect, m in-memory k-means runs). Returns a numpy
    array of shape (m, K, dim/m)."""
    import numpy as np

    X = np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in base.select(vec_col).limit(sample_cap).collect()
        ]
    )
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    K = 1 << nbits
    return np.stack(
        [
            _kmeans(X[:, i * dsub : (i + 1) * dsub], K, seed + i)
            for i in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """One Arrow-batched pass assigning each subvector its nearest codebook
    entry: (id, codes array<int> of length m). This is the index build —
    the stored table afterwards is m small ints per row instead of the raw
    vector. Ties break to the lowest code id (matches the SQL oracle's
    ROW_NUMBER tie-break)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(codebooks, dtype=np.float64)  # (m, K, dsub)
    m, _, dsub = C.shape

    def _enc(batches):
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in b["_v"]])
            codes = np.empty((len(X), m), dtype=np.int32)
            for i in range(m):
                sub = X[:, i * dsub : (i + 1) * dsub]
                d = ((sub[:, None, :] - C[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = np.argmin(d, axis=1)  # first minimum wins
            yield pd.DataFrame(
                {"_id": b["_id"], "_c": [list(map(int, r)) for r in codes]}
            )

    out = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(_enc, "_id long, _c array<int>")
        .select(F.col("_id").alias(id_col), F.col("_c").alias(out_col))
    )
    return out


def pq_query_luts(
    queries: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query ADC lookup table: lut[i][j] = ||q_sub_i - C[i][j]||^2, an
    m x K array column. Built Arrow-batched on the (small, broadcastable)
    query side."""
    import numpy as np
    import pandas as pd

    C = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = C.shape

    def _lut(batches):
        for b in batches:
            if not len(b):
                continue
            rows = []
            for v in b["_v"]:
                q = np.asarray(v, dtype=np.float64)
                rows.append(
                    [
                        [
                            float(((q[i * dsub : (i + 1) * dsub] - c) ** 2).sum())
                            for c in C[i]
                        ]
                        for i in range(m)
                    ]
                )
            yield pd.DataFrame({"_id": b["_id"], "_l": rows})

    return (
        queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(_lut, "_id long, _l array<array<double>>")
        .select(F.col("_id").alias("qid"), F.col("_l").alias("lut"))
    )


def _adc_dist() -> F.Column:
    """JVM ADC: zip the code array with the LUT and sum the looked-up
    subspace distances — stays inside whole-stage codegen on the big side
    (codes are 1-based-indexed into each LUT row via element_at)."""
    picked = F.zip_with(
        F.col("codes"), F.col("lut"), lambda c, l: F.element_at(l, c + 1)
    )
    return F.round(
        F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x), 4
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a PQ-encoded table: broadcast the per-query LUTs, scan
    the code table once JVM-side, window top-k per query. Distance is the
    PQ approximation of squared L2 (rounded to 4 before ranking so the
    orders are FP-noise-robust; ties break on neighbor id)."""
    luts = pq_query_luts(queries, codebooks, id_col, vec_col)
    scored = (
        codes_df.select(F.col(id_col).alias("nid"), "codes")
        .crossJoin(F.broadcast(luts))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", _adc_dist().alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy("dist", "nid")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "dist", "rk")
    )


def pq_refine(
    candidates: DataFrame,
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact re-rank of ADC candidates (the FAISS IndexRefineFlat stage):
    fetch raw vectors for the candidate ids ONLY (equi-join on id — the
    fetch is proportional to k*refine per query, not the corpus), compute
    true squared L2 JVM-side, keep the exact top-k. PQ's quantization error
    can't mis-rank what it never ranks — ADC only nominates."""
    nv = base.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("nv")
    )
    qv = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    exact = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("nv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    scored = (
        candidates.select("qid", "nid")
        .join(nv, "nid")
        .join(F.broadcast(qv), "qid")
        .select("qid", "nid", exact.alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy("dist", "nid")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "dist", "rk")
    )


def pq_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    codebooks=None,
    refine: int | None = None,
) -> DataFrame:
    """End-to-end PQ search: train (or inject) codebooks, encode the base
    table, ADC-scan; with ``refine=r``, exact-re-rank the top k*r ADC
    candidates (the accuracy/IO knob — ADC alone ranks coarsely when true
    neighbor distances are below the quantization error). ``codebooks``
    injection mirrors ivf_topk's quantizer-injection shape (and makes the
    output SQL-derivable for deterministic codebooks — the q119 oracle)."""
    if codebooks is None:
        codebooks = pq_train(base, m, nbits, vec_col, seed)
    codes = pq_encode(base, codebooks, id_col, vec_col)
    if not refine:
        return pq_adc_topk(codes, queries, codebooks, k, id_col, vec_col)
    cand = pq_adc_topk(codes, queries, codebooks, k * refine, id_col, vec_col)
    return pq_refine(cand, base, queries, k, id_col, vec_col)


def ivfpq_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    num_clusters: int = 10,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids=None,
    codebooks=None,
) -> DataFrame:
    """IVF-PQ: the coarse quantizer bounds which cells a query scans
    (O(N * nprobe / nlist) rows), PQ bounds bytes per scanned row — the
    standard billion-scale composition. Cell assignment reuses
    similarity.ivf's machinery shape: one Arrow pass computing BOTH the
    nearest-centroid cell and the PQ codes, so the index build reads the
    corpus once. Search: rank the broadcast centroid table per query,
    equi-join the probed cell ids, ADC within the probed cells."""
    import numpy as np
    import pandas as pd

    from fireworks_spark.operators.similarity import _spherical_kmeans

    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    else:
        sample = np.stack(
            [
                np.asarray(r[0], dtype=np.float64)
                for r in base.select(vec_col).limit(100_000).collect()
            ]
        )
        C = _spherical_kmeans(sample, num_clusters, seed)
    if codebooks is None:
        codebooks = pq_train(base, m, nbits, vec_col, seed)
    CB = np.asarray(codebooks, dtype=np.float64)
    mm, _, dsub = CB.shape

    def _index(batches):
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in b["_v"]])
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Xn @ C.T, axis=1).astype(np.int32)
            codes = np.empty((len(X), mm), dtype=np.int32)
            for i in range(mm):
                sub = X[:, i * dsub : (i + 1) * dsub]
                d = ((sub[:, None, :] - CB[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "nid": b["_id"],
                    "pt": cell,
                    "codes": [list(map(int, r)) for r in codes],
                }
            )

    indexed = base.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(_index, "nid long, pt int, codes array<int>")

    from fireworks_spark.functions.vector import cosine_similarity

    cent_df = base.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "pt int, cv array<double>",
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        "qid",
        "qv",
        "pt",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("cs"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cs"), F.col("pt"))
    probe = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "pt")
    )
    luts = pq_query_luts(queries, codebooks, id_col, vec_col)
    scored = (
        indexed.join(F.broadcast(probe), "pt")
        .join(F.broadcast(luts), "qid")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", _adc_dist().alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy("dist", "nid")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "dist", "rk")
    )


def sq8_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar 8-bit quantization (the FAISS SQ8 shape, per-vector max-abs
    scaling): scale = max|x_d| / 127, code_d = clamp(floor(x_d/scale +
    0.5), -127, 127). Returns (id_col, scale double, codes array<int>).
    4x the footprint cut of float32 with none of PQ's training — the
    first rung of the memory-bound ANN ladder (PQ is the 32x rung).

    Entirely JVM-side HOF expressions — no Python anywhere, the encode
    IS the scan. floor(x+0.5) is the repo's portable rounding (COVERAGE
    convention 2), so a SQL oracle re-derives every code and q159
    value-checks encode AND reconstruction error end-to-end. The
    all-zero vector has scale 0 and all-zero codes by definition.

    ``scale`` is materialized in its own projection before the code
    lambda references it: inlined, the max-abs subtree re-evaluates PER
    ELEMENT inside the lambda (no CSE inside lambdas — the repo's
    documented read_fastq pitfall), turning the encode O(dim^2) per row
    (measured 6.2s -> 0.9s on 32k 64-dim vectors)."""
    staged = df.select(
        id_col,
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn(
        "scale",
        F.array_max(F.transform("_v", lambda x: F.abs(x))) / 127.0,
    )
    sc = F.col("scale")
    codes = F.when(
        sc == 0.0, F.transform("_v", lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            "_v",
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x / sc + F.lit(0.5)).cast("int"),
                ),
            ),
        )
    )
    return staged.select(id_col, "scale", codes.alias("codes"))


def sq8_decode(
    scale_col: str = "scale", codes_col: str = "codes"
) -> F.Column:
    """Reconstruction column for an sq8_encode frame: code_d * scale."""
    return F.transform(
        F.col(codes_col), lambda c: c.cast("double") * F.col(scale_col)
    )
