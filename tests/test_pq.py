"""Product-quantization tests: encode correctness and ADC exactness on
codebook-aligned data (closed form), recall on clustered data vs brute
force, IVF-PQ degradation to plain PQ under exhaustive probe, and the
JVM-scan plan shape (Python only in encode + LUT build)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fireworks_spark.operators import pq, similarity


def test_encode_and_adc_exact_on_codebook_points(spark):
    """Vectors assembled FROM codebook entries reconstruct exactly, so the
    ADC distance must equal the true squared L2 distance to 4 decimals."""
    # m=2 subspaces of 2 dims, K=4 codes each
    CB = np.array(
        [
            [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [5.0, 5.0]],
            [[0.0, 0.0], [2.0, 2.0], [-1.0, 3.0], [4.0, 0.0]],
        ]
    )
    combos = [(a, b) for a in range(4) for b in range(4)]
    vecs = [
        (i, [float(x) for x in np.concatenate([CB[0][a], CB[1][b]])])
        for i, (a, b) in enumerate(combos)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    codes = {
        r.vec_id: r.codes for r in pq.pq_encode(df, CB).collect()
    }
    assert codes == {i: [a, b] for i, (a, b) in enumerate(combos)}

    q = df.filter(F.col("vec_id") == 0)
    got = pq.pq_adc_topk(pq.pq_encode(df, CB), q, CB, k=15).collect()
    base = dict(vecs)
    for r in got:
        true = sum((x - y) ** 2 for x, y in zip(base[0], base[r.nid]))
        assert r.dist == pytest.approx(round(true, 4), abs=1e-9)
    # ranks are ascending-distance with nid tie-break
    dists = [(r.dist, r.nid) for r in sorted(got, key=lambda r: r.rk)]
    assert dists == sorted(dists)


def test_pq_recall_on_clustered_data(spark):
    """Unit-norm planted clusters: PQ top-5 must recover >= 80% of the
    exact cosine top-5 (L2 on unit vectors ranks identically to cosine)."""
    rng = np.random.default_rng(7)
    dim, n_clusters, per = 16, 5, 20
    centers = rng.normal(size=(n_clusters, dim)) * 10
    X = np.concatenate(
        [c + rng.normal(scale=0.3, size=(per, dim)) for c in centers]
    )
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") % 20 == 0)
    brute, adc, refined = {}, {}, {}
    for r in similarity.cosine_topk(df, q, k=5).collect():
        brute.setdefault(r.qid, set()).add(r.nid)
    for r in pq.pq_topk(df, q, k=5, m=4, nbits=4).collect():
        adc.setdefault(r.qid, set()).add(r.nid)
    for r in pq.pq_topk(df, q, k=5, m=4, nbits=4, refine=4).collect():
        refined.setdefault(r.qid, set()).add(r.nid)
    # pure ADC ranks coarsely (quantization error ~ within-cluster gaps)
    # but must route to the right CLUSTER...
    same_cluster = sum(
        1 for qq, s in adc.items() for n in s if n // 20 == qq // 20
    )
    assert same_cluster / 25 >= 0.9, f"ADC cluster routing {same_cluster}/25"
    # ...and the exact re-rank stage recovers the true neighbors.
    # Effective recall: within a tight cluster many cosines tie at the
    # 4-decimal rounding both operators apply, so a returned neighbor
    # counts if it is as close as the query's true 5th-best (tolerance
    # 1e-3) — the standard ANN effective-recall metric.
    def cos(a, b):
        return float(a @ b)  # unit vectors

    hits = total = 0
    for qq, s in refined.items():
        floor = min(cos(X[qq], X[n]) for n in brute[qq]) - 1e-3
        total += len(s)
        hits += sum(1 for n in s if cos(X[qq], X[n]) >= floor)
    assert hits / total >= 0.95, f"PQ+refine effective recall {hits}/{total}"


def test_ivfpq_exhaustive_probe_equals_plain_pq(spark):
    """With every cell probed the IVF restriction vanishes: IVF-PQ must
    return exactly the plain-PQ ADC result for shared codebooks."""
    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 3)
    CB = pq.pq_train(df, m=2, nbits=3)
    cents = X[:4]  # injected coarse quantizer, 4 cells
    plain = {
        (r.qid, r.rk): (r.nid, r.dist)
        for r in pq.pq_topk(df, q, k=5, codebooks=CB).collect()
    }
    ivf = {
        (r.qid, r.rk): (r.nid, r.dist)
        for r in pq.ivfpq_topk(
            df, q, k=5, nprobe=4, centroids=cents, codebooks=CB
        ).collect()
    }
    assert ivf == plain


def test_adc_scan_stays_jvm_side(spark):
    """The big-side ADC scan is codegen'd: exactly TWO Arrow stages exist in
    the plan (base encode + query LUT build), none on the scored scan."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 2)
    out = pq.pq_topk(df, q, k=3, m=2, nbits=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # broadcast LUTs, big side streams


def test_sq8_roundtrip_error_bound(spark):
    """SQ8: codes stay in [-127, 127], the max-abs element maps to +/-127,
    reconstruction error is bounded by scale/2 per element, and the
    all-zero vector encodes to zeros with scale 0."""
    from fireworks_spark.operators import pq

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-2.54, 1.27, 0.01, 2.54]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc = {r.vec_id: r for r in pq.sq8_encode(df).collect()}
    assert enc[2].scale == 0.0 and enc[2].codes == [0, 0, 0, 0]
    assert enc[1].codes[0] == 127  # max-abs element saturates
    assert enc[3].codes[0] == -127 and enc[3].codes[3] == 127
    for vid, vec in rows:
        e = enc[vid]
        assert all(-127 <= c <= 127 for c in e.codes)
        for x, c in zip(vec, e.codes):
            assert abs(x - c * e.scale) <= e.scale / 2 + 1e-12

    dec = {
        r.vec_id: r.rec
        for r in pq.sq8_encode(df)
        .select("vec_id", pq.sq8_decode().alias("rec"))
        .collect()
    }
    for vid, vec in rows:
        assert all(
            abs(x - y) <= enc[vid].scale / 2 + 1e-12
            for x, y in zip(vec, dec[vid])
        )
