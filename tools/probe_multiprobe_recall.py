"""Multi-probe LSH recall at sf1 density (VERDICT r12 #3).

q184's planted-cluster unit test proves the Hamming-1 probing mechanism at
toy scale; this probe measures what multi-probe actually buys at real
density: recall@k vs the brute-force cosine ranking over the sf1
embeddings table (20k vectors, dim 64), single-probe vs multi-probe at
the same bits, across bit widths.

    python tools/probe_multiprobe_recall.py [--sf-dir /root/repo/testdata_sf1]
        [--queries 200] [--k 5] [--bits 4,6,8]

Prints one JSON line per (bits, mode): mean recall@k + candidate volume
(rows entering the verify join — the cost the banding controls).
Recorded in SCALE.md round 13.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata_sf1")
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--bits", default="4,6,8")
    ap.add_argument("--master", default="local[24]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fireworks_spark.operators import similarity
    from fireworks_spark.session import get_spark
    from fireworks_spark.tables import table

    spark = get_spark(
        app_name="multiprobe-recall", master=args.master, shuffle_partitions=24
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = table(spark, args.sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < args.queries)
    n_base = e.count()

    truth = (
        similarity.cosine_topk(e, q, k=args.k)
        .select("qid", "nid")
        .collect()
    )
    truth_sets: dict = {}
    for r in truth:
        truth_sets.setdefault(r["qid"], set()).add(r["nid"])

    out = []
    for bits in [int(b) for b in args.bits.split(",")]:
        for probe in (False, True):
            ann = similarity.lsh_bucket_topk(
                e, q, k=args.k, num_bits=bits, dim=64, probe_hamming1=probe
            )
            got: dict = {}
            for r in ann.select("qid", "nid").collect():
                got.setdefault(r["qid"], set()).add(r["nid"])
            recalls = [
                len(got.get(qid, set()) & t) / len(t)
                for qid, t in truth_sets.items()
            ]
            # candidate volume: rows entering the verify/rank stage
            bb = e.withColumn(
                "bucket", similarity._sign_bucket("embedding", bits, False, 64)
            ).select(F.col("vec_id").alias("nid"), "bucket")
            qb = q.withColumn(
                "bucket", similarity._sign_bucket("embedding", bits, False, 64)
            ).select(F.col("vec_id").alias("qid"), "bucket")
            if probe:
                flips = F.array(
                    F.lit(0), *[F.lit(1 << j) for j in range(bits)]
                )
                qb = qb.withColumn("_f", F.explode(flips)).select(
                    "qid",
                    F.col("bucket").bitwiseXOR(F.col("_f")).alias("bucket"),
                )
            cand = bb.join(qb, "bucket").count()
            rec = {
                "bits": bits,
                "multi_probe": probe,
                "recall_at_k": round(sum(recalls) / len(recalls), 4),
                "candidates": cand,
                "cand_frac_of_brute": round(
                    cand / (len(truth_sets) * n_base), 4
                ),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
