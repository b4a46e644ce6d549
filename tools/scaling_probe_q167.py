"""q167 state-growth probe (VERDICT r10 #7): is the stream-stream interval
join's watermark state genuinely BOUNDED, or creeping?

Context: the sf3 risk sweep measured q167 at 3.6x per 3x data — the
steepest of the streaming family — and flagged possible state growth. But
q167's harness deliberately runs watermark="365 days" over a 30-day event
span so that NO state is ever purged (every cross-batch pair must form for
the batch-SQL value oracle to hold). Under that setting state is all rows
by design; the 3.6x is the harness contract, not the operator.

This probe measures the PRODUCTION setting: interval_join_stream with a
finite watermark (2 hours, the default) over events replayed
chronologically in 6 micro-batches, at sf1-events (1M rows) and
sf10-events (10M rows — one more decade, same 30-day span, 10x density).
If watermark purging works, per-batch state plateaus at
~density x (watermark + upper-bound) rows per side instead of
accumulating across batches, max-state scales ~10x with density (not with
batch count), and wall time stays ~linear in rows. For contrast it also
replays sf1 under the q167 harness watermark (365 days) where state MUST
grow monotonically to ~all rows — the named creep, shown to be the
harness's, not the operator's.

Events are generated here (events only, same schema/distributions as
tools/gen_testdata.py) into /tmp — sf10's other tables would be 60M-row
lineitem for no benefit.

Usage: python tools/scaling_probe_q167.py [--out /tmp/q167_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_events(sf: float, out_dir: str, seed: int = 42) -> str:
    """events.parquet at scale sf (1M rows/sf, 30-day span, 15k users/sf)
    — the events block of tools/gen_testdata.py, verbatim distributions."""
    rng = np.random.default_rng(seed)
    n_ev = int(1_000_000 * sf)
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    gaps = rng.exponential(span_us / n_ev, n_ev)
    cum = np.cumsum(gaps)
    cum = cum * ((span_us - 1) / cum[-1])
    ts = t0 + cum.astype(np.int64).astype("timedelta64[us]")
    n_users = int(15_000 * sf)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "user_id": rng.integers(0, max(n_users, 1), n_ev).astype(
                np.int64
            ),
            "event_type": pa.array(
                rng.choice(
                    ["click", "view", "purchase", "signup", "error"], n_ev
                )
            ),
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
            ),
        }),
        os.path.join(out_dir, "events.parquet"),
    )
    return out_dir


def stage_slices(spark, sf_dir: str, d: str, n: int) -> str:
    """Chronological time-slices as separate files with increasing mtimes
    so maxFilesPerTrigger=1 replays them in event-time order."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id",
        # pyarrow writes timestamp[us] as TIMESTAMP_NTZ; watermarks and
        # the double cast below need a zoned TIMESTAMP (same normalize as
        # fireworks_spark.tables.normalize_event_ts, session tz = UTC)
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
    )
    qs = src.select(F.col("ts").cast("double").alias("t")).approxQuantile(
        "t", [i / n for i in range(1, n)], 0.0001
    )
    stage = os.path.join(d, "staged")
    os.makedirs(stage)
    base = os.stat(stage).st_mtime
    t = F.col("ts").cast("double")
    for i in range(n):
        s = src
        if i > 0:
            s = s.filter(t > qs[i - 1])
        if i < n - 1:
            s = s.filter(t <= qs[i])
        sd = os.path.join(d, f"s{i}")
        s.coalesce(1).write.parquet(sd)
        for nm in sorted(os.listdir(sd)):
            if nm.endswith(".parquet"):
                dst = os.path.join(stage, f"part-{i:03d}.parquet")
                shutil.copy(os.path.join(sd, nm), dst)
                os.utime(dst, (base + i + 1, base + i + 1))
    return stage


def run_case(spark, sf_dir: str, watermark: str, n_slices: int) -> dict:
    from fireworks_spark import streaming

    d = tempfile.mkdtemp(prefix="fw_q167_probe_")
    try:
        stage = stage_slices(spark, sf_dir, d, n_slices)
        schema = spark.read.parquet(stage).schema
        mk = (
            lambda: spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        joined = streaming.interval_join_stream(
            mk(), mk(), "user_id", watermark=watermark
        )
        out = os.path.join(d, "out")
        t0 = time.perf_counter()
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p.get("stateOperators") and p["numInputRows"] > 0
        ]
        n_out = spark.read.parquet(out).count()
        return {
            "watermark": watermark,
            "wall_sec": wall,
            "out_pairs": int(n_out),
            "state_rows_per_batch": state_rows,
            "max_state_rows": max(state_rows) if state_rows else 0,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/q167_probe.json")
    ap.add_argument("--slices", type=int, default=6)
    args = ap.parse_args()

    from fireworks_spark.session import get_spark

    spark = get_spark(app_name="q167-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"slices": args.slices}
    work = tempfile.mkdtemp(prefix="fw_q167_data_")
    try:
        for sf in (1, 10):
            sf_dir = gen_events(sf, os.path.join(work, f"sf{sf}"))
            results[f"sf{sf}_wm2h"] = run_case(
                spark, sf_dir, "2 hours", args.slices
            )
            print(f"sf{sf} wm=2h: {results[f'sf{sf}_wm2h']}", flush=True)
        # the q167 harness setting: state must creep to ~all rows (by
        # design — the value oracle needs every cross-batch pair)
        results["sf1_wm365d"] = run_case(
            spark,
            os.path.join(work, "sf1"),
            "365 days",
            args.slices,
        )
        print(f"sf1 wm=365d: {results['sf1_wm365d']}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
