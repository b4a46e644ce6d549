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
        [--only q154,q32] [--skip q31]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
            if name in ORACLES and not args.no_oracle:
                t1 = time.perf_counter()
                odf = con.sql(ORACLES[name]).df()
                rec["oracle_sec"] = round(time.perf_counter() - t1, 3)
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

    ok = sum(1 for r in results.values() if r["ok"])
    out = {
        "sf": 1, "sf_dir": args.sf_dir, "master": args.master,
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
