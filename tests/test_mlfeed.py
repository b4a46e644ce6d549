"""ML-feed layer unit tests: Arrow batch plumbing, model wrapper, driver-side
batch iterator, multimodal metadata/decode stand-ins."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fireworks_spark import mlfeed
from fireworks_spark.operators import multimodal


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(i, [float(i), float(i + 1), float(i + 2)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )


def test_linear_model_math(spark, vecs):
    m = mlfeed.LinearModel([1.0, 0.0, -1.0], bias=10.0)
    out = m.transform(vecs, "vec_id long, score double").collect()
    # w.x + b = i - (i+2) + 10 = 8 for every row
    assert all(r.score == 8.0 for r in out)
    assert len(out) == 20


def test_batch_transform_cardinality_change(spark, vecs):
    def explode_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vec_id": b["vec_id"].repeat(2)})

    out = mlfeed.batch_transform(vecs, explode_fn, "vec_id long")
    assert out.count() == 40  # mapInPandas may change cardinality (UDTF)


def test_grouped_transform_sees_whole_group(spark):
    df = spark.createDataFrame(
        [(g, v) for g in ["a", "b"] for v in range(5)], "g string, v long"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": [pdf["g"].iloc[0]], "n": [len(pdf)], "s": [int(pdf["v"].sum())]}
        )

    rows = {
        r.g: (r.n, r.s)
        for r in mlfeed.grouped_transform(
            df, ["g"], fn, "g string, n long, s long"
        ).collect()
    }
    assert rows == {"a": (5, 10), "b": (5, 10)}


def test_batch_iterator_sizes_and_tail(spark, vecs):
    batches = list(mlfeed.batch_iterator(vecs.select("vec_id"), 6))
    assert [len(b) for b in batches] == [6, 6, 6]  # tail of 2 dropped
    batches = list(
        mlfeed.batch_iterator(vecs.select("vec_id"), 6, drop_tail=False)
    )
    assert [len(b) for b in batches] == [6, 6, 6, 2]
    seen = [v for b in batches for v in b["vec_id"]]
    assert sorted(seen) == list(range(20))


def test_fit_linear_converges_to_truth(spark):
    """Reference model_test.py:238-431 strategy: generate data from a known
    linear model + noise, train, assert parameters approach truth."""
    import random

    rnd = random.Random(3)
    true_w, true_b = [2.0, -1.5, 0.5], 4.0
    rows = []
    for i in range(600):
        x = [rnd.gauss(0, 1) for _ in range(3)]
        y = sum(wi * xi for wi, xi in zip(true_w, x)) + true_b + rnd.gauss(0, 0.01)
        rows.append((i, x, y))
    df = spark.createDataFrame(rows, "id long, x array<double>, y double")
    model = mlfeed.fit_linear(df, "x", "y", lr=0.1, epochs=12, batch_size=128)
    w = model.params["w"]
    assert all(abs(wi - ti) < 0.05 for wi, ti in zip(w, true_w))
    assert abs(model.params["b"] - true_b) < 0.05
    # the fitted model scores distributed
    scored = model.transform(
        df.select("id", "x", "y"), "id long, y double, score double"
    )
    row = scored.filter(F.col("id") == 0).collect()[0]
    assert abs(row.score - row.y) < 0.1


def test_metrics_accumulator_matches_batch(spark, vecs):
    vals = vecs.select("vec_id", (F.col("vec_id") * 2.0).alias("v"))
    m = mlfeed.Metrics(["v"])
    for part in range(4):
        m.update(vals.filter(F.col("vec_id") % 4 == part))
    got = m.compile()["v"]
    assert got["n"] == 20
    assert got["mean"] == pytest.approx(19.0)  # mean of 0,2,...,38
    assert got["min"] == 0.0 and got["max"] == 38.0


def test_suggest_arrow_batch_size(spark, vecs):
    n = mlfeed.suggest_arrow_batch_size(vecs, target_mb=1.0)
    assert 64 <= n
    # bigger rows -> smaller batches
    wide = vecs.select("vec_id", F.array_repeat(F.lit(1.0), 1000).alias("w"))
    assert mlfeed.suggest_arrow_batch_size(wide, target_mb=1.0) < n


def test_index_map(spark):
    from fireworks_spark.operators import toolbox

    df = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "idx long, v string")
    mapping = spark.createDataFrame(
        [(0, 10), (2, 20)], "input_idx long, output_idx long"
    )
    out = {r.v: r.idx for r in toolbox.index_map(df, mapping).collect()}
    assert out == {"a": 10, "c": 20}  # unmapped row dropped


def test_sniff_format(spark):
    df = spark.createDataFrame(
        [
            (1, bytes.fromhex("FFD8FFE0") + b"rest"),
            (2, bytes.fromhex("89504E47") + b"rest"),
            (3, b"plain text"),
        ],
        "id long, media binary",
    )
    out = {r.id: r.format for r in df.select(
        "id", multimodal.sniff_format("media").alias("format")
    ).collect()}
    assert out == {1: "jpeg", 2: "png", 3: "unknown"}
    meta = multimodal.with_media_meta(df, "media").collect()[0]
    assert meta.n_bytes == 8 and len(meta.content_md5) == 32


def test_extract_features_deterministic(spark):
    import hashlib

    df = spark.createDataFrame([(1, b"hello")], "doc_id long, media binary")
    row = multimodal.extract_features(df, "media", "doc_id", dim=4).collect()[0]
    h = hashlib.md5(b"hello").hexdigest()
    assert [row.f0, row.f1, row.f2, row.f3] == [ord(c) / 100.0 for c in h[:4]]


def test_frame_sample_cardinality_and_content(spark):
    raw = bytes(range(200))  # 200 bytes -> 4 frames of 64 (last short)
    df = spark.createDataFrame([(1, raw)], "doc_id long, media binary")
    rows = {
        r.frame_idx: bytes(r.frame)
        for r in multimodal.frame_sample(
            df, "media", "doc_id", frame_bytes=64, every_n=2
        ).collect()
    }
    assert sorted(rows) == [0, 2]  # frames 0 and 2 of 0..3
    assert rows[0] == raw[0:64]
    assert rows[2] == raw[128:192]


def test_resize_gray_block_means(spark):
    # 4x4 grid of bytes 0..15, resized to 2x2 -> block means
    raw = bytes(range(16))
    df = spark.createDataFrame([(1, raw)], "doc_id long, media binary")
    row = multimodal.resize_gray(
        df, "media", "doc_id", width=4, out_w=2, out_h=2
    ).collect()[0]
    assert row.thumb == [2.5, 4.5, 10.5, 12.5]


def test_audio_windows_rms(spark):
    import numpy as np

    raw = bytes([3] * 256 + [4] * 100)  # two windows
    df = spark.createDataFrame([(1, raw)], "doc_id long, media binary")
    rows = {
        r.win_idx: r
        for r in multimodal.audio_windows(
            df, "media", "doc_id", window_bytes=256
        ).collect()
    }
    assert rows[0].n_bytes == 256 and rows[0].rms == 3.0
    assert rows[1].n_bytes == 100 and rows[1].rms == 4.0


def test_media_blockhash_and_dup_pairs(spark):
    """Block hash: identical byte streams collide exactly; a lightly
    perturbed copy lands within a small Hamming radius; an unrelated
    stream does not pair. Band blocking must recover every brute-force
    pair at the radius (pigeonhole recall 1)."""
    import itertools

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, 4096).astype(np.uint8).tobytes()
    # flip a few bytes -> most block means unchanged
    near = bytearray(base)
    for i in range(0, 40):
        near[i * 100] = (near[i * 100] + 7) % 256
    other = rng.randint(0, 256, 4096).astype(np.uint8).tobytes()
    rows = [(1, base), (2, bytes(near)), (3, other), (4, base)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    sig = {
        r.doc_id: r.phash
        for r in multimodal.media_blockhash(df, "media", "doc_id").collect()
    }
    assert sig[1] == sig[4]  # identical bytes -> identical hash
    got = {
        (r.ida, r.idb): r.hamming
        for r in multimodal.media_dup_pairs(
            df, "media", "doc_id", max_hamming=12
        ).collect()
    }
    # brute-force reference at the same radius
    want = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin(sig[a] ^ sig[b]).count("1") <= 12
    }
    assert got == want
    assert got[(1, 4)] == 0
    assert (1, 2) in got and got[(1, 2)] > 0  # near-dup found, not exact
    assert (1, 3) not in got  # unrelated stream stays out


def test_media_blockhash_empty_is_null_and_unpaired(spark):
    """Empty (or NULL) media has no perceptual content: NULL phash, never
    paired — two empty streams must NOT collide at Hamming 0."""
    rows = [(1, b"abcdef" * 100), (2, b""), (3, b""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    sig = {
        r.doc_id: r.phash
        for r in multimodal.media_blockhash(df, "media", "doc_id").collect()
    }
    assert sig[2] is None and sig[3] is None and sig[4] is None
    assert sig[1] is not None
    pairs = multimodal.media_dup_pairs(
        df, "media", "doc_id", max_hamming=47
    ).collect()
    ids = {i for r in pairs for i in (r.ida, r.idb)}
    assert not ids & {2, 3, 4}, f"empty media paired: {pairs}"


def test_tokens_udtf_matches_jvm_explode(spark):
    from fireworks_spark import mlfeed

    mlfeed.register_tokens_udtf(spark)
    d = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, None), (4, "xy")],
        "doc_id long, text string",
    )
    d.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        "SELECT doc_id, t.pos, t.token "
        "FROM udtf_docs, LATERAL tokens(text) t ORDER BY doc_id, pos"
    ).collect()
    want = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
        )
        .where(F.col("token") != "")
        .orderBy("doc_id", "pos")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_negative_samples_deterministic_non_self(spark):
    from fireworks_spark import mlfeed

    df = spark.createDataFrame([(i * 3,) for i in range(10)], "doc_id long")
    out = mlfeed.negative_samples(df, k=3).collect()
    assert len(out) == 30
    assert all(r.doc_id != r.neg_id for r in out)  # never the anchor
    # negatives are real members of the (gappy-id) corpus
    ids = {i * 3 for i in range(10)}
    assert all(r.neg_id in ids for r in out)
    again = mlfeed.negative_samples(df, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_spread_not_degenerate(spark):
    from fireworks_spark import mlfeed

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = mlfeed.negative_samples(df, k=4).collect()
    # the 400 draws hit a broad slice of the corpus, not a few hot ids
    distinct_negs = len({r.neg_id for r in out})
    assert distinct_negs >= 60
