"""Second decade for the dedup production paths: documents at sf10
(500k rows — 10x the sf1 fixture the sweeps anchor on).

SCALE.md charts sf1 -> sf3 for the dedup family; this probe adds
sf1 -> sf10, a full decade, for the paths a 100 TB pipeline would
actually run: exact/line/chunk hash dedup (linear by contract) and
MinHash-LSH batch + cross-corpus (the declared scale path, expected
sub-linear per decade in per-row cost). The quadratic-by-contract exact
families (q31/q33/q34/q134) are deliberately excluded — their curves are
already measured to sf3 against their contracts and their production
alternative IS the MinHash family probed here.

Documents are generated with the same distribution family as
tools/gen_testdata.py (empirical vocab/lang anchors from the driver
fixture, ~5% trailing-" dup" near-duplicates, seed 42) into /tmp —
cost-curve probes need the distribution, not byte parity with any
committed fixture. Timing-only (rows + wall), mirroring
sf1_sweep --no-oracle.

Usage: python tools/scaling_probe_docs10.py [--out /tmp/docs10_probe.json]
       [--queries q30,q32,q98,q110,q135]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/testdata/sf0.1"


def gen_documents(sf: float, out_dir: str, seed: int = 42) -> str:
    """documents.parquet at scale sf (50k rows/sf) — the documents block
    of tools/gen_testdata.py, verbatim distributions."""
    rng = np.random.default_rng(seed)
    n_doc = int(50_000 * sf)
    refdocs = pq.read_table(
        os.path.join(REF, "documents.parquet"), columns=["text", "lang"]
    )
    texts = refdocs.column("text").to_pylist()
    vocab = sorted({w for t in texts[:2000] for w in t.split(" ")} - {"dup"})
    langs, lang_counts = np.unique(
        np.asarray(refdocs.column("lang")), return_counts=True
    )
    lang_p = lang_counts / lang_counts.sum()

    doc_texts: list = []
    is_dup = rng.random(n_doc) < 0.05
    for i in range(n_doc):
        if is_dup[i] and doc_texts:
            src_i = int(rng.integers(0, len(doc_texts)))
            doc_texts.append(doc_texts[src_i] + " dup")
        else:
            nw = int(rng.integers(10, 101))
            doc_texts.append(" ".join(rng.choice(vocab, nw)))
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": pa.array(doc_texts),
            "lang": pa.array(rng.choice(langs, n_doc, p=lang_p)),
            "source": pa.array(
                [f"src{j}" for j in rng.integers(0, 20, n_doc)]
            ),
            "n_chars": np.asarray(
                [len(t) for t in doc_texts], dtype=np.int64
            ),
        }),
        os.path.join(out_dir, "documents.parquet"),
    )
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/docs10_probe.json")
    ap.add_argument("--queries", default="q30,q32,q98,q110,q135")
    ap.add_argument("--sf", type=float, default=10.0)
    ap.add_argument("--shuffle", type=int, default=48)
    args = ap.parse_args()

    from fireworks_spark.registry import QUERIES
    from fireworks_spark.session import get_spark

    spark = get_spark(
        app_name="docs10-probe", shuffle_partitions=args.shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")

    picked = {p for p in args.queries.split(",") if p}
    work = tempfile.mkdtemp(prefix="fw_docs10_")
    results: dict = {"sf": args.sf}
    try:
        t0 = time.perf_counter()
        gen_documents(args.sf, work)
        results["gen_sec"] = round(time.perf_counter() - t0, 1)
        for name, fn in QUERIES.items():
            if not any(name.startswith(p + "_") or name == p for p in picked):
                continue
            t0 = time.perf_counter()
            try:
                df = fn(spark, work)
                # full materialization (bench.py methodology): a noop
                # write computes EVERY column — count() alone lets
                # Catalyst prune the payload and under-reports any query
                # whose cost lives in a column the count doesn't need
                df.write.mode("overwrite").format("noop").save()
                wall = round(time.perf_counter() - t0, 2)
                results[name] = {"wall_sec": wall, "rows": df.count()}
            except Exception as exc:  # noqa: BLE001 — record and continue
                results[name] = {
                    "wall_sec": round(time.perf_counter() - t0, 2),
                    "error": f"{type(exc).__name__}: {exc}"[:200],
                }
            print(f"{name}: {results[name]}", flush=True)
            spark.catalog.clearCache()
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
