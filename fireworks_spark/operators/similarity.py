"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (exact; the query side is broadcast so the
big side never shuffles). Scale paths: sign-projection LSH bucketing and a
label-partitioned IVF-style probe — both turn the crossJoin into an equi-join
on a bucket key, which is what survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fireworks_spark.functions.vector import (
    band_key,
    cosine_similarity,
    dot,
    sign_bits,
)


def cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (brute force).

    queries is broadcast (small by construction); the base table streams
    through map-side — no shuffle until the per-query top-k, which is a
    window over qid bounded at k rows per query by WindowGroupLimit.
    Ordering is total: (rounded sim desc, neighbor id).
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    b = base.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )


def _sign_bucket(
    vec_col: str, num_bits: int, portable: bool = False, dim: int | None = None
) -> F.Column:
    """Single random-hyperplane LSH bucket id: the num_bits sign bits packed
    into one integer (see functions.vector.sign_bits — deterministic
    xxhash64-derived projections, no driver state; ``portable`` swaps in
    the md5-parity projections a SQL oracle can reproduce; ``dim`` enables
    the constant-folded projection matrix — same bits, no per-row
    hashing)."""
    return band_key(
        sign_bits(vec_col, num_bits, portable=portable, dim=dim), 0, num_bits
    )


def lsh_bucket_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
    dim: int | None = None,
    probe_hamming1: bool = False,
) -> DataFrame:
    """ANN top-k searching the query's sign-projection bucket.

    The crossJoin becomes an equi-join on the bucket id: at scale each of the
    2^num_bits buckets holds ~N/2^bits vectors and the shuffle is hash
    partitioned by bucket. Recall < 1 by construction (probe only 1 bucket)
    and DECAYS as N/bucket grows at fixed bits; raise it by lowering
    num_bits or setting ``probe_hamming1``.

    ``probe_hamming1`` is multi-probe LSH (Lv et al., VLDB'07, the
    fixed-radius variant): each query also probes its ``num_bits``
    Hamming-1 neighbor buckets — band_key packs bits positionally, so the
    neighbor keys are bucket XOR (1 << j). A true neighbor differing in
    exactly one hyperplane sign (the dominant miss mode at small bits) is
    then found. Still an equi-join: the QUERY side (broadcast, small)
    explodes x(num_bits+1); the base side is untouched, and each (qid,
    nid) pair can match at most once because a base vector lives in
    exactly one bucket and the probed keys are distinct.

    Pass ``dim`` (the embedding dimensionality, known to every real index)
    so the projection matrix constant-folds instead of re-hashing per row.
    """
    bb = base.withColumn(
        "bucket", _sign_bucket(vec_col, num_bits, portable, dim)
    ).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "bucket"
    )
    qb = queries.withColumn(
        "bucket", _sign_bucket(vec_col, num_bits, portable, dim)
    ).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket"
    )
    if probe_hamming1:
        flips = F.array(
            F.lit(0), *[F.lit(1 << j) for j in range(num_bits)]
        )
        qb = qb.withColumn("_flip", F.explode(flips)).select(
            "qid",
            "qv",
            F.col("bucket").bitwiseXOR(F.col("_flip")).alias("bucket"),
        )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        bb.join(F.broadcast(qb), "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )


def _l2_normalized(vec_col: str) -> F.Column:
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(dot(v, v))
    return F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)


def _spherical_kmeans(X, k: int, seed: int, iters: int = 25):
    """Deterministic spherical k-means on an in-memory sample: k-means++
    init from rng(seed), assign by max cosine, recenter on the unit sphere.
    Returns a (k, dim) numpy array of unit centroids. Empty clusters keep
    their previous centroid (cannot collapse below k lists)."""
    import numpy as np

    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    # k-means++ seeding with cosine distance
    C = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d2 = np.min(
            [1.0 - X @ c for c in C], axis=0
        ).clip(min=0.0)
        total = d2.sum()
        if total <= 0:
            C.append(X[rng.integers(len(X))])
            continue
        C.append(X[rng.choice(len(X), p=d2 / total)])
    C = np.stack(C)
    prev = None
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        if prev is not None and np.array_equal(a, prev):
            break
        prev = a
        for j in range(k):
            members = X[a == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[j] = m / n
    return C


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    num_clusters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
    centroids=None,
) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer (spherical k-means).

    Train: spherical k-means (euclidean k-means on the unit sphere ==
    cosine k-means) on a driver-side numpy sample — the FAISS recipe: the
    quantizer trains on a bounded sample (``fit_fraction``, capped rows),
    because centroids, not the fit set, define the index; in-memory
    iterations cost microseconds where distributed sweeps cost a scheduler
    round-trip each (measured 8s of job overhead for 2000 vectors).
    Index: ONE distributed pass (Arrow-batched argmax matmul) assigns every
    vector its nearest centroid — the inverted list id. Search: each query
    ranks the tiny broadcast centroid table, probes its ``nprobe`` nearest
    lists via an equi-join on the centroid id, then exact top-k within the
    probed lists. ``nprobe == num_clusters`` degrades gracefully to exact
    brute force (asserted in tests/test_similarity.py, alongside the
    partial-probe recall bound).
    """
    import numpy as np
    import pandas as pd

    if centroids is not None:
        # precomputed coarse quantizer (FAISS's quantizer-injection shape).
        # Rows are L2-normalized here because the assignment below ranks by
        # DOT of normalized vectors — cosine is scale-invariant, so any
        # positive scaling of the injected rows yields identical cells.
        C = np.asarray(centroids, dtype=np.float64)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    else:
        fit_df = base.sample(fit_fraction, seed=seed) if fit_fraction else base
        sample = np.stack(
            [
                np.asarray(r[0], dtype=np.float64)
                for r in fit_df.select(vec_col).limit(100_000).collect()
            ]
        )
        C = _spherical_kmeans(sample, num_clusters, seed)

    def _assign(batches):
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in b["nv"]])
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            yield pd.DataFrame(
                {
                    "nid": b["nid"],
                    "nv": b["nv"],
                    "pt": np.argmax(Xn @ C.T, axis=1).astype(np.int32),
                }
            )

    vec_type = dict(base.dtypes)[vec_col]
    assigned = base.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
    ).mapInPandas(_assign, f"nid long, nv {vec_type}, pt int")
    centroids = base.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "pt int, cv array<double>",
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "qid", "qv", "pt", cosine_similarity(F.col("qv"), F.col("cv")).alias("cs")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cs"), F.col("pt"))
    probe = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qv", "pt")
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        assigned.join(F.broadcast(probe), "pt")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )


def mmr_rerank(
    scored: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    qid_col: str = "qid",
    id_col: str = "nid",
    score_col: str = "sim",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of a per-query candidate list: greedily pick ``k`` items maximizing
    ``lam * relevance - (1 - lam) * max cosine to the already-picked set``
    (first pick by pure ``lam * relevance``; ties to the lowest id) — the
    standard diversity stage between ANN top-k and RAG context assembly,
    next to ranking.rrf_fuse.

    Returns (qid_col, rk, id_col, mmr).  Scores are computed in EXACT
    scaled-integer arithmetic: with sims quantized to 4 decimals and
    ``lam`` to 3, ``mmr * 1e7 = lam1000 * sim4 - (1000 - lam1000) * ms4``
    is an int64, so the greedy argmax never compares doubles and the
    reported score (one int64 / 1e7 division at the end) is bit-identical
    in any IEEE engine re-deriving the picks — no decimal half-way
    rounding case can exist on either side.

    Scale: candidate lists are top-k-sized by construction (tens to
    hundreds per query), so the greedy loop runs inside ONE applyInPandas
    task per query over its own candidates — per-query cost k * |cand|
    sims via a BLAS gram, shuffle bounded by the candidate table, never
    the corpus. The picks are exactly re-derivable step by step in SQL
    (q149's oracle chains one CTE per selection)."""
    import numpy as np
    import pandas as pd

    joined = scored.select(
        F.col(qid_col).alias("_q"),
        F.col(id_col).alias("_n"),
        F.col(score_col).cast("double").alias("_rel"),
    ).join(
        vectors.select(
            F.col(vec_id_col).alias("_n"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        "_n",
    )

    lam_i = int(round(lam * 1000))  # lambda quantized to 3 decimals

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_n").reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        # pairwise sims quantized to 4 decimals, held as int64 (sim*1e4):
        # the repo's cross-engine cosine convention (q34) made exact —
        # every score below is pure integer arithmetic
        G4 = np.rint(np.round(Vn @ Vn.T, 4) * 1e4).astype(np.int64)
        rel4 = np.rint(np.round(pdf["_rel"].to_numpy(), 4) * 1e4).astype(
            np.int64
        )
        n = len(pdf)
        # maxsim starts as None, NOT zeros: cosines can be negative, and
        # clamping the diversity term at 0 would silently reward items
        # anti-similar to the picked set less than the definition does
        maxsim4 = None
        picked = np.zeros(n, dtype=bool)
        sentinel = np.iinfo(np.int64).min
        out_rk, out_n, out_s = [], [], []
        for rk in range(1, min(k, n) + 1):
            if maxsim4 is None:
                score7 = lam_i * rel4  # mmr * 1e7, exactly
            else:
                score7 = lam_i * rel4 - (1000 - lam_i) * maxsim4
            score7 = np.where(picked, sentinel, score7)
            i = int(np.argmax(score7))  # first max == lowest id (sorted)
            picked[i] = True
            maxsim4 = (
                G4[:, i].copy()
                if maxsim4 is None
                else np.maximum(maxsim4, G4[:, i])
            )
            out_rk.append(rk)
            out_n.append(pdf["_n"].iloc[i])
            # single division of an exact int64 by 1e7: bit-identical to
            # any other IEEE engine performing the same division
            out_s.append(float(int(score7[i]) / 1e7))
        return pd.DataFrame(
            {"_q": pdf["_q"].iloc[0], "rk": out_rk, "_n": out_n, "mmr": out_s}
        )

    return (
        joined.groupBy("_q")
        .applyInPandas(_mmr, "_q long, rk int, _n long, mmr double")
        .select(
            F.col("_q").alias(qid_col),
            "rk",
            F.col("_n").alias(id_col),
            "mmr",
        )
    )
