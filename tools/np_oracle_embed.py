"""Numpy/BLAS value oracles for the two pairwise-quadratic embedding
queries, q34_dedup_embedding_cosine and q103_semdedup, at fixtures where
the DuckDB SQL oracle is infeasible.

The registry's SQL oracles compute cosines with per-pair list_reduce
lambdas — ~80 G lambda evaluations for q34 at sf1 (20k vectors, 200 M
pairs x 3 folds x 64 dims), hours of single-threaded DuckDB. The same
exact float64 math runs in seconds as chunked matrix products. This is
still an INDEPENDENT check of the Spark implementation: the engine
computes block-pair grams inside a distributed join (dedup.py
blocked_cosine_pairs / semdedup's applyInPandas), while this oracle is a
single flat in-memory sweep with its own assignment and prune logic.

Rounding: both engines round cosines to 4 decimals before thresholding.
Reported mismatches include the unrounded value so a rounding-boundary
coincidence (|sim*1e4 - k - 0.5| ~ float error) is distinguishable from
a real defect; none has been observed.

Usage:
    python tools/np_oracle_embed.py [--sf-dir /root/repo/testdata_sf1]
        [--only q34|q103]
Prints one OK/FAIL line per query; exit code 1 on any FAIL.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _r4(x: np.ndarray) -> np.ndarray:
    """Half-up 4-decimal rounding (matches SQL ROUND for positive sims)."""
    return np.floor(x * 1e4 + 0.5) / 1e4


def q34_pairs(ids: np.ndarray, Xn: np.ndarray, threshold: float = 0.5):
    """All pairs ida < idb with round(cos, 4) >= threshold, chunked."""
    n = len(ids)
    out: dict[tuple[int, int], float] = {}
    chunk = 2048
    for s in range(0, n, chunk):
        G = Xn[s : s + chunk] @ Xn.T  # (chunk, n)
        G4 = _r4(G)
        ii, jj = np.nonzero(G4 >= threshold)
        for i, j in zip(ii + s, jj):
            if i < j:
                out[(int(ids[i]), int(ids[j]))] = float(G4[i - s, j])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata_sf1")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--record-json",
        default="",
        help="write sweep-style {query: record} JSON here (side file so a "
        "concurrent sweep process can merge it without a write race)",
    )
    args = ap.parse_args()
    records: dict[str, dict] = {}

    import duckdb

    pdf = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{args.sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    from fireworks_spark.session import get_spark

    spark = get_spark(
        app_name="np-oracle-embed", master="local[24]", shuffle_partitions=48
    )
    spark.sparkContext.setLogLevel("ERROR")
    failed = False

    if args.only in ("", "q34"):
        from fireworks_spark.registry import QUERIES

        t0 = time.perf_counter()
        got = {
            (r.ida, r.idb): r.sim
            for r in QUERIES["q34_dedup_embedding_cosine"](
                spark, args.sf_dir
            ).collect()
        }
        t1 = time.perf_counter()
        want = q34_pairs(ids, Xn)
        t2 = time.perf_counter()
        extra = {k: v for k, v in got.items() if k not in want}
        missing = {k: v for k, v in want.items() if k not in got}
        diff = {
            k: (got[k], want[k])
            for k in got.keys() & want.keys()
            if abs(got[k] - want[k]) > 1e-9
        }
        ok = not extra and not missing and not diff
        failed |= not ok
        records["q34_dedup_embedding_cosine"] = {
            "spark_sec": round(t1 - t0, 1),
            "rows": len(got),
            "ok": ok,
            "oracle_sec": round(t2 - t1, 1),
            "oracle_mode": (
                "numpy-blas (tools/np_oracle_embed.py): exact pair set + "
                f"sims, {len(extra)} extra/{len(missing)} missing/"
                f"{len(diff)} valdiff"
            ),
            "note": "DuckDB lambda-fold SQL infeasible at this scale; "
            "BLAS oracle is the established exact substitute "
            "(SWEEP_SF1.json r11 precedent)",
        }
        print(
            f"q34_dedup_embedding_cosine: {'OK' if ok else 'FAIL'} "
            f"pairs={len(want)} spark={t1 - t0:.1f}s oracle={t2 - t1:.1f}s "
            f"extra={len(extra)} missing={len(missing)} valdiff={len(diff)}"
        )
        for k in list(extra)[:5]:
            print("  extra", k, extra[k])
        for k in list(missing)[:5]:
            print("  missing", k, missing[k])
        for k in list(diff)[:5]:
            print("  valdiff", k, diff[k])

    if args.only in ("", "q103"):
        from fireworks_spark.registry import QUERIES

        t0 = time.perf_counter()
        got = {
            (r.vec_id, r.cluster)
            for r in QUERIES["q103_semdedup"](spark, args.sf_dir).collect()
        }
        t1 = time.perf_counter()
        # centroids = per-label means of the RAW embeddings
        pts = sorted(set(labels.tolist()))
        C = np.stack([X[labels == p].mean(axis=0) for p in pts])
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        sims = _r4(Xn @ Cn.T)  # (n, k) assignment cosines, rounded
        # argmax with ties to the LOWEST pt (np.argmax takes the first max)
        assign = np.asarray(pts)[np.argmax(sims, axis=1)]
        kept: set[tuple[int, int]] = set()
        for p in pts:
            member_idx = np.nonzero(assign == p)[0]
            # ids are sorted ascending already (ORDER BY vec_id in _load)
            Sub = Xn[member_idx]
            G = _r4(Sub @ Sub.T)
            m = len(member_idx)
            dropped = (np.triu(G >= 0.5, k=1)).any(axis=0)  # any earlier
            for local in range(m):
                if not dropped[local]:
                    kept.add((int(ids[member_idx[local]]), int(p)))
        t2 = time.perf_counter()
        extra = got - kept
        missing = kept - got
        ok = not extra and not missing
        failed |= not ok
        records["q103_semdedup"] = {
            "spark_sec": round(t1 - t0, 1),
            "rows": len(got),
            "ok": ok,
            "oracle_sec": round(t2 - t1, 1),
            "oracle_mode": (
                "numpy-blas (tools/np_oracle_embed.py): exact kept set, "
                f"{len(extra)} extra/{len(missing)} missing"
            ),
        }
        print(
            f"q103_semdedup: {'OK' if ok else 'FAIL'} kept={len(kept)} "
            f"spark={t1 - t0:.1f}s oracle={t2 - t1:.1f}s "
            f"extra={len(extra)} missing={len(missing)}"
        )
        for k in list(extra)[:5]:
            print("  extra", k)
        for k in list(missing)[:5]:
            print("  missing", k)

    if args.record_json:
        import json

        tmp = args.record_json + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(records, fh, indent=1)
        os.replace(tmp, args.record_json)
        print(f"wrote {len(records)} record(s) to {args.record_json}")

    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
