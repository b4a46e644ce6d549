"""Full-registry oracle sweep at sf1 (VERDICT r8 item 1).

Runs every registry query on the 10x fixture (tools/gen_testdata.py ->
testdata_sf1/), value-checks each against its DuckDB oracle over the SAME
parquet, and records per-query wall-times for BOTH engines so the sf0.1 ->
sf1 cost curve can be compared per family (SCALE.md).

Output: one JSON file (default SWEEP_SF1.json) of
    {"sf": 1, "master": ..., "total_spark_sec": ..., "queries":
     {name: {"spark_sec": s, "oracle_sec": s, "rows": n, "ok": bool,
             "problems": [...]}}}

Usage:
    python tools/sf1_sweep.py [--sf-dir testdata_sf1] [--out SWEEP_SF1.json]
        [--only q154,q32] [--skip q31] [--oracle-cap 600]

Round-14 hardening (memory: host-pathology / VERDICT r13 #2):
- results are written INCREMENTALLY after every query, so a killed or
  timed-out sweep loses nothing;
- ``--oracle-cap N`` interrupts any DuckDB oracle past N seconds
  (duckdb.interrupt()) and records ``oracle_capped`` instead of hanging
  the whole sweep on one pathological window;
- the three recursive-closure oracles (q42/q43/q115) are evaluated
  ITERATIVELY by default: DuckDB computes the Jaccard pairs (the
  non-recursive 95%% of the SQL), a Python min-label union-find computes
  the closure — same ground truth, still fully independent of the Spark
  implementation, without DuckDB's 300-1900s recursive-CTE cost on this
  host. ``--recursive-closure`` restores the pure-SQL path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Oracles whose ONLY expensive part is a recursive connected-components CTE;
# sweep-side they evaluate as DuckDB pairs + Python union-find (identical
# min-label semantics, proven by tests/test_sweep_closure.py).
CLOSURE_QUERIES = (
    "q42_dup_clusters",
    "q43_keep_canonical",
    "q115_leakage_safe_split",
)


_PAIRS_CACHE: dict = {}


def closure_oracle_df(con, name: str, cache_key=None):
    """Evaluate a recursive-closure oracle iteratively: the jac-pairs CTE
    (non-recursive) runs in DuckDB, the transitive closure runs as a
    Python union-find with min-label canonicalisation — exactly what the
    recursive cc/canon CTE computes (cluster = min doc_id reachable).
    ``cache_key`` (the sweep passes its sf_dir) opts into caching the
    pairs result: q42/q43/q115 share the identical CTE, and at sf1 it
    costs minutes — paying it once per sweep instead of three times.
    The key is caller-provided data identity, NOT id(con) (a reused
    object address after GC would silently serve another dataset's
    pairs); None (the default, and what tests use) disables caching."""
    import pandas as pd

    from fireworks_spark.queries_pipeline import (
        CLOSURE_JACCARD_THRESHOLD,
        CLOSURE_SPLIT_K,
        _SHINGLES_CTE,
    )

    pairs = _PAIRS_CACHE.get(cache_key) if cache_key is not None else None
    if pairs is None:
        pairs = con.sql(
            f"WITH {_SHINGLES_CTE} SELECT ida, idb FROM jac "
            f"WHERE jac >= {CLOSURE_JACCARD_THRESHOLD}"
        ).df()
        if cache_key is not None:
            _PAIRS_CACHE.clear()  # one sweep, one fixture: bound the cache
            _PAIRS_CACHE[cache_key] = pairs
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    members: set = set()
    for ida, idb in zip(pairs["ida"], pairs["idb"]):
        a, b = find(int(ida)), find(int(idb))
        if a != b:
            # union by MIN so every root is its component's min id
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
        members.add(int(ida))
        members.add(int(idb))
    cluster = {m: find(m) for m in members}
    if name == "q42_dup_clusters":
        ids = sorted(cluster)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "cluster": pd.Series(
                    [cluster[i] for i in ids], dtype="int64"
                ),
            }
        )
    docs = con.sql("SELECT doc_id FROM documents ORDER BY doc_id").df()
    if name == "q43_keep_canonical":
        non_canon = {i for i, c in cluster.items() if i != c}
        return docs[~docs["doc_id"].isin(non_canon)].reset_index(drop=True)
    if name == "q115_leakage_safe_split":
        split = [
            int(cluster.get(int(i), int(i))) % CLOSURE_SPLIT_K
            for i in docs["doc_id"]
        ]
        return pd.DataFrame(
            {
                "doc_id": docs["doc_id"],
                "split": pd.Series(split, dtype="int64"),
            }
        )
    raise KeyError(name)


def run_oracle_capped(con, sql: str, cap: float):
    """con.sql(sql).df() with a wall cap: a watchdog thread calls
    con.interrupt() at ``cap`` seconds. Returns (df, None) or
    (None, 'oracle_capped after Ns'). The watchdog's fired flag — not a
    wall-clock heuristic — decides capped vs genuine error, and an
    interrupt that lands after the query already finished is absorbed
    with a throwaway query so it cannot cancel the NEXT oracle on the
    shared connection."""
    done = threading.Event()
    fired = threading.Event()

    def watchdog():
        if not done.wait(cap):
            fired.set()
            try:
                con.interrupt()
            except Exception:
                pass

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        try:
            df = con.sql(sql).df()
            err = None
        except Exception as exc:
            # capped iff the watchdog fired AND the exception is DuckDB's
            # interrupt — a genuine SQL failure that happens to land after
            # the cap (OOM at 910s) must NOT be reported as a time cap
            if fired.is_set() and "Interrupt" in type(exc).__name__:
                df = None
                err = f"oracle_capped after {cap:.0f}s"
            else:
                raise
    finally:
        # runs on EVERY exit, including a genuine-error raise: stop the
        # watchdog, wait until it is past its interrupt call, then absorb
        # any interrupt that landed late so it cannot cancel the NEXT
        # query on this shared connection
        done.set()
        w.join()
        if fired.is_set():
            try:
                con.sql("SELECT 1").df()
            except Exception:
                pass
    return df, err


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata_sf1")
    ap.add_argument("--out", default="/root/repo/SWEEP_SF1.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--master", default="local[24]")
    ap.add_argument("--shuffle", type=int, default=48)
    ap.add_argument(
        "--no-oracle", action="store_true",
        help="timing-only (cost-curve) mode: skip the DuckDB compare — "
        "rows + wall time per query; correctness-at-scale is the sf1 "
        "sweep's job, scale-3+ runs chart the curve shape",
    )
    ap.add_argument(
        "--oracle-cap", type=float, default=0,
        help="interrupt any single DuckDB oracle past this many seconds "
        "(0 = uncapped); a capped oracle records oracle_capped, the "
        "sweep continues",
    )
    ap.add_argument(
        "--recursive-closure", action="store_true",
        help="evaluate q42/q43/q115 with the pure recursive-CTE SQL "
        "instead of the iterative pairs+union-find default",
    )
    ap.add_argument(
        "--resume", action="store_true",
        help="load --out if it exists and skip queries already recorded "
        "OK there (failed/capped ones re-run) — lets a long sweep be "
        "paused (e.g. to free the host for a bench pass) and picked "
        "back up without redoing finished work",
    )
    args = ap.parse_args()

    from fireworks_spark.oracle import compare, duckdb_connect
    from fireworks_spark.registry import ORACLES, QUERIES
    from fireworks_spark.session import get_spark

    spark = get_spark(
        app_name="sf1-sweep", master=args.master,
        shuffle_partitions=args.shuffle,
    )
    con = duckdb_connect(args.sf_dir)

    only = {p for p in args.only.split(",") if p}
    skip = {p for p in args.skip.split(",") if p}

    def picked(name: str) -> bool:
        if skip and any(name.startswith(p) for p in skip):
            return False
        return not only or any(name.startswith(p) for p in only)

    results: dict[str, dict] = {}
    total = 0.0
    if args.resume and os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                prior = json.load(fh)
            for k, r in (prior.get("queries") or {}).items():
                if r.get("ok") and k in QUERIES:
                    results[k] = r
                    total += r.get("spark_sec", 0.0)
            print(f"[resume] carrying {len(results)} OK queries from "
                  f"{args.out}", flush=True)
        except Exception as exc:  # unreadable checkpoint: start fresh
            print(f"[resume] could not load {args.out}: {exc}", flush=True)
    for name, fn in QUERIES.items():
        if not picked(name) or name in results:
            continue
        rec: dict = {}
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, args.sf_dir)
            pdf = sdf.toPandas()
            rec["spark_sec"] = round(time.perf_counter() - t0, 3)
            rec["rows"] = len(pdf)
            if name in ORACLES and not args.no_oracle:
                t1 = time.perf_counter()
                capped = None
                if name in CLOSURE_QUERIES and not args.recursive_closure:
                    odf = closure_oracle_df(con, name, cache_key=args.sf_dir)
                    rec["oracle_mode"] = "iterative_closure"
                elif args.oracle_cap > 0:
                    odf, capped = run_oracle_capped(
                        con, ORACLES[name], args.oracle_cap
                    )
                else:
                    odf = con.sql(ORACLES[name]).df()
                rec["oracle_sec"] = round(time.perf_counter() - t1, 3)
                if capped:
                    rec["ok"] = False
                    rec["error"] = capped
                else:
                    problems = compare(sdf, odf, spark_pdf=pdf)
                    rec["ok"] = not problems
                    if problems:
                        rec["problems"] = problems
            else:
                rec["ok"] = rec["rows"] >= 0
        except Exception as exc:  # noqa: BLE001 — record and continue
            rec["spark_sec"] = round(time.perf_counter() - t0, 3)
            rec["ok"] = False
            rec["error"] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc(file=sys.stderr)
        total += rec["spark_sec"]
        results[name] = rec
        print(
            f"{name}: {'OK' if rec['ok'] else 'FAIL'} "
            f"spark={rec['spark_sec']}s oracle={rec.get('oracle_sec', '-')}s "
            f"rows={rec.get('rows', '-')}",
            flush=True,
        )
        # incremental checkpoint: a killed/timed-out sweep keeps everything
        # finished so far (memory: sf1 sweeps used to write only at END)
        _write(args, results, total, partial=True)

    _write(args, results, total, partial=False)
    ok = sum(1 for r in results.values() if r["ok"])
    print(f"\n{ok}/{len(results)} ok, {total:.0f}s spark total -> {args.out}")


def _sf_of(sf_dir: str) -> "float | None":
    """sf parsed from the fixture dir name (testdata_sf1 -> 1, sf0.1 ->
    0.1) — hardcoding 1 left SWEEP_SF3.json carrying '"sf": 1' with an
    sf3 sf_dir (VERDICT r14 nit #4)."""
    import re

    m = re.search(r"sf([0-9.]+)$", os.path.basename(os.path.normpath(sf_dir)))
    if not m:
        return None
    v = float(m.group(1))
    return int(v) if v == int(v) else v


def _write(args, results: dict, total: float, partial: bool) -> None:
    ok = sum(1 for r in results.values() if r["ok"])
    out = {
        "sf": _sf_of(args.sf_dir), "sf_dir": args.sf_dir, "master": args.master,
        "shuffle_partitions": args.shuffle,
        "ok": ok, "checked": len(results),
        "total_spark_sec": round(total, 1),
        "queries": results,
    }
    if partial:
        out["partial"] = True  # cleared by the final end-of-sweep write
    tmp = args.out + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh, indent=1)
    os.replace(tmp, args.out)


if __name__ == "__main__":
    main()
