#!/usr/bin/env python
"""Numpy value oracle for the exact n-gram-Jaccard query family at
fixtures where the DuckDB SQL oracle is infeasible (round 15: sf3).

The registry's SQL oracles all share one `inter` CTE — explode distinct
word-3-gram shingles, self-join on shingle, GROUP BY doc pair. Its cost
is sum over shingles of df^2/2; the sf3 fixture concentrates 7.9M
(doc, shingle) rows on only 27,931 distinct shingles (mean df ~284), so
`inter` materializes ~1.17e9 join rows — DuckDB ground through it
single-threaded for 30+ minutes twice without reaching an interrupt
check (q168, sweep log). The same exact arithmetic runs in minutes as a
flat numpy pass: DuckDB does only the LINEAR shingle extraction (the
same `sh`/`sizes` CTEs, ~10s), then the pair-intersection counts come
from one preallocated int64 key array (ida * K + idb per co-occurrence,
triu per shingle), one in-place sort, and one run-length encode —
exactly the `GROUP BY 1, 2` + count. Jaccard rounds half-up to 3
decimals like the SQL (floor(x*1000 + 0.5)/1000).

Still an INDEPENDENT check of the Spark implementation (np_oracle_embed
precedent, r11/r14): the engine computes prefix-filtered AllPairs /
banded LSH joins inside Spark; this oracle is a single in-memory sweep
with its own shingling pulled straight from the parquet text.

One pair table serves the whole family:
  q31_dedup_ngram_jaccard   all pairs ida<idb, jac >= 0.5
  q32_dedup_minhash_lsh     all pairs ida<idb, jac >= 0.8
  q134_jaccard_join         even->odd cross pairs, jac >= 0.5
  q135_minhash_join         even->odd cross pairs, jac >= 0.8
  q168_stream_dedup_against odd ids with NO even partner at jac >= 0.8
  q42/q43/q115 (closure)    pairs jac >= CLOSURE_JACCARD_THRESHOLD,
                            fed to sf1_sweep.closure_oracle_df's pinned
                            min-label union-find via its pairs cache

Usage:
    python tools/np_oracle_jaccard.py [--sf-dir /root/repo/testdata_sf3]
        [--only q31,q135] [--merge-into SWEEP_SF3_r15.json]
Prints one OK/FAIL line per query; --merge-into records each result in
the sweep artifact with oracle_mode "np_jaccard".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SH_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS w
  FROM read_parquet('{path}')
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, array_length(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM toks WHERE array_length(w) >= 3
)
SELECT doc_id, hash(shingle) AS sid FROM sh
"""


def _r3(x: np.ndarray) -> np.ndarray:
    """Half-up 3-decimal rounding — floor(x*1000 + 0.5)/1000, the SQL's."""
    return np.floor(x * 1000 + 0.5) / 1000


def jaccard_pairs_table(sf_dir: str):
    """(ida, idb, jac) for every doc pair sharing >= 1 shingle, ida < idb.

    Returns (ida int64[], idb int64[], jac float64[]). Exact — no
    sampling, no df cap, no banding."""
    import duckdb

    path = os.path.join(sf_dir, "documents.parquet")
    pdf = duckdb.sql(SH_SQL.format(path=path)).df()
    doc = pdf["doc_id"].to_numpy(np.int64)
    sid = pdf["sid"].to_numpy(np.uint64)
    # the 64-bit shingle hash is a grouping key; a collision would merge
    # two shingle groups and corrupt counts — with ~28k shingles the
    # probability is ~1e-11, but assert anyway (it's one cheap query)
    n_sid = len(np.unique(sid))
    n_sh = duckdb.sql(
        "SELECT COUNT(DISTINCT shingle) FROM ("
        + SH_SQL.format(path=path).replace(
            "SELECT doc_id, hash(shingle) AS sid FROM sh",
            "SELECT shingle FROM sh",
        )
        + ")"
    ).fetchone()[0]
    assert n_sid == n_sh, f"shingle hash collision: {n_sid} != {n_sh}"
    # per-doc shingle-set sizes (pdf rows are already DISTINCT pairs)
    uids, sizes = np.unique(doc, return_counts=True)
    szmap = dict(zip(uids.tolist(), sizes.tolist()))
    K = int(doc.max()) + 1

    # group docs by shingle id: sort once, then slice runs
    order = np.argsort(sid, kind="stable")
    sid_s, doc_s = sid[order], doc[order]
    bnd = np.flatnonzero(sid_s[1:] != sid_s[:-1]) + 1
    starts = np.concatenate(([0], bnd))
    ends = np.concatenate((bnd, [len(sid_s)]))
    dfs = ends - starts
    total = int((dfs.astype(np.int64) * (dfs - 1) // 2).sum())

    keys = np.empty(total, dtype=np.int64)
    pos = 0
    triu_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for s, e in zip(starts, ends):
        d = e - s
        if d < 2:
            continue
        tri = triu_cache.get(d)
        if tri is None:
            tri = np.triu_indices(d, 1)
            triu_cache[d] = tri
        grp = np.sort(doc_s[s:e])
        a = grp[tri[0]]
        b = grp[tri[1]]
        n = a.size
        keys[pos : pos + n] = a * K + b
        pos += n
    assert pos == total
    keys.sort(kind="quicksort")  # in place: the only O(total) big buffer
    neq = keys[1:] != keys[:-1]
    starts2 = np.concatenate(([0], np.flatnonzero(neq) + 1))
    counts = np.diff(np.concatenate((starts2, [total]))).astype(np.int64)
    uk = keys[starts2]
    ida = uk // K
    idb = uk % K
    sz = np.zeros(K, dtype=np.int64)
    sz[uids] = sizes
    jac = _r3(counts / (sz[ida] + sz[idb] - counts))
    return ida, idb, jac


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata_sf3")
    ap.add_argument("--only", default="")
    ap.add_argument("--merge-into", default="")
    ap.add_argument("--master", default="local[24]")
    args = ap.parse_args()
    only = {p for p in args.only.split(",") if p}

    def picked(name: str) -> bool:
        return not only or any(name.startswith(p) for p in only)

    t0 = time.perf_counter()
    ida, idb, jac = jaccard_pairs_table(args.sf_dir)
    t_pairs = round(time.perf_counter() - t0, 1)
    print(f"pair table: {len(ida)} co-occurring pairs in {t_pairs}s",
          flush=True)

    even_a, odd_a = ida % 2 == 0, ida % 2 == 1
    even_b, odd_b = idb % 2 == 0, idb % 2 == 1
    # cross pairs (lid even, rid odd) from both orientations of ida<idb
    m1 = even_a & odd_b
    m2 = odd_a & even_b
    c_lid = np.concatenate((ida[m1], idb[m2]))
    c_rid = np.concatenate((idb[m1], ida[m2]))
    c_jac = np.concatenate((jac[m1], jac[m2]))

    def odf_self(thr: float):
        m = jac >= thr
        return (
            pd.DataFrame({"ida": ida[m], "idb": idb[m], "jac": jac[m]})
            .sort_values(["ida", "idb"])
            .reset_index(drop=True)
        )

    def odf_cross(thr: float):
        m = c_jac >= thr
        return (
            pd.DataFrame({"lid": c_lid[m], "rid": c_rid[m], "jac": c_jac[m]})
            .sort_values(["lid", "rid"])
            .reset_index(drop=True)
        )

    def odf_q168():
        import duckdb

        dup = set(c_rid[c_jac >= 0.8].tolist())
        docs = duckdb.sql(
            f"SELECT doc_id FROM read_parquet("
            f"'{os.path.join(args.sf_dir, 'documents.parquet')}') "
            f"WHERE doc_id % 2 = 1 ORDER BY doc_id"
        ).df()
        return docs[~docs["doc_id"].isin(dup)].reset_index(drop=True)

    from fireworks_spark.oracle import compare, duckdb_connect
    from fireworks_spark.queries_pipeline import CLOSURE_JACCARD_THRESHOLD
    from fireworks_spark.registry import QUERIES
    from fireworks_spark.session import get_spark

    spark = get_spark(app_name="np-oracle-jaccard", master=args.master,
                      shuffle_partitions=48)
    spark.sparkContext.setLogLevel("ERROR")

    # closure trio: inject the jac>=threshold pairs into sf1_sweep's
    # pinned union-find evaluator via its pairs cache, so the closure
    # semantics stay the tested ones (tests/test_sweep_closure.py)
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "sf1_sweep",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "sf1_sweep.py"),
    )
    sf1_sweep = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(sf1_sweep)
    mcl = jac >= CLOSURE_JACCARD_THRESHOLD
    sf1_sweep._PAIRS_CACHE[args.sf_dir] = pd.DataFrame(
        {"ida": ida[mcl], "idb": idb[mcl]}
    )
    con = duckdb_connect(args.sf_dir)

    jobs: list[tuple[str, object]] = [
        ("q31_dedup_ngram_jaccard", lambda: odf_self(0.5)),
        ("q32_dedup_minhash_lsh", lambda: odf_self(0.8)),
        ("q134_jaccard_join", lambda: odf_cross(0.5)),
        ("q135_minhash_join", lambda: odf_cross(0.8)),
        ("q168_stream_dedup_against", odf_q168),
        ("q42_dup_clusters",
         lambda: sf1_sweep.closure_oracle_df(
             con, "q42_dup_clusters", cache_key=args.sf_dir)),
        ("q43_keep_canonical",
         lambda: sf1_sweep.closure_oracle_df(
             con, "q43_keep_canonical", cache_key=args.sf_dir)),
        ("q115_leakage_safe_split",
         lambda: sf1_sweep.closure_oracle_df(
             con, "q115_leakage_safe_split", cache_key=args.sf_dir)),
    ]

    merged: dict[str, dict] = {}
    failed = False
    for name, ofn in jobs:
        if not picked(name):
            continue
        rec: dict = {"oracle_mode": "np_jaccard"}
        t1 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, args.sf_dir)
            pdf = sdf.toPandas()
            rec["spark_sec"] = round(time.perf_counter() - t1, 3)
            rec["rows"] = len(pdf)
            t2 = time.perf_counter()
            odf = ofn()
            rec["oracle_sec"] = round(time.perf_counter() - t2 + t_pairs, 3)
            problems = compare(sdf, odf, spark_pdf=pdf)
            rec["ok"] = not problems
            if problems:
                rec["problems"] = problems
        except Exception as exc:  # noqa: BLE001
            rec["ok"] = False
            rec["error"] = f"{type(exc).__name__}: {exc}"
        failed |= not rec["ok"]
        merged[name] = rec
        print(f"{name}: {'OK' if rec['ok'] else 'FAIL'} "
              f"spark={rec.get('spark_sec')}s rows={rec.get('rows')} "
              f"{rec.get('problems') or rec.get('error') or ''}", flush=True)

    if args.merge_into:
        with open(args.merge_into) as fh:
            doc = json.load(fh)
        doc.setdefault("queries", {}).update(merged)
        doc["ok"] = sum(1 for r in doc["queries"].values() if r.get("ok"))
        doc["checked"] = len(doc["queries"])
        tmp = args.merge_into + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, args.merge_into)
        print(f"merged {len(merged)} into {args.merge_into}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
