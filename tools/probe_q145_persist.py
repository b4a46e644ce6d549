#!/usr/bin/env python
"""q145 substring_dedup A/B at sf1 (VERDICT r15 item 5): the window table
``occ`` feeds both the first-occurrence aggregate and the redundant-
occurrence join, so window generation (slice+array_join per position, xN
tokens) executes twice. A = status quo (recompute), B = persist(occ).
Alternating A/B pairs in ONE session per the window-flap discipline;
spill/memory pressure is the documented risk of B (the persisted rows
carry the full 20-token window text at use_hash=False).

    python tools/probe_q145_persist.py [reps] [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FIREWORKS_SCRATCH_WAREHOUSE", "1")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fireworks_spark.functions.text import words
from fireworks_spark.operators.dedup import _spread
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table


def substring_dedup_variant(
    df: DataFrame, k: int, use_hash: bool, persist_occ: bool
) -> "tuple[DataFrame, list]":
    """Copy of dedup.substring_dedup with a persist toggle on occ."""
    toks = _spread(df).select(
        F.col("doc_id").alias("_id"), words("text").alias("_w")
    )
    n = F.size("_w")
    starts = F.when(
        n >= k, F.sequence(F.lit(0), n - k)
    ).otherwise(F.array().cast("array<int>"))
    win = F.array_join(F.slice("_w", F.col("_p") + 1, k), " ")
    occ = toks.select("_id", "_w", F.explode(starts).alias("_p")).select(
        "_id", "_p", (F.xxhash64(win) if use_hash else win).alias("_key")
    )
    handles = []
    if persist_occ:
        occ = occ.persist()
        handles.append(occ)
    firsts = occ.groupBy("_key").agg(
        F.min(F.struct(F.col("_id"), F.col("_p"))).alias("_f"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    redundant = (
        occ.join(firsts.filter(F.col("_cnt") >= 2), "_key")
        .filter(
            (F.col("_id") != F.col("_f._id")) | (F.col("_p") != F.col("_f._p"))
        )
        .select("_id", "_p")
    )
    covered = redundant.select(
        "_id",
        F.explode(F.sequence(F.col("_p"), F.col("_p") + k - 1)).alias("_pos"),
    ).distinct()
    tokpos = toks.select("_id", F.posexplode("_w").alias("_pos", "_tok"))
    kept = tokpos.join(covered, ["_id", "_pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_tok")))
                ),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    sizes = toks.select("_id", n.alias("_n"))
    out = sizes.join(rebuilt, "_id", "left").select(
        F.col("_id").alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        (F.col("_n") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )
    return out, handles


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="probe-q145",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, sf_dir, "documents")

    def run(tag: str, persist_occ: bool) -> float:
        spark.sparkContext.setJobDescription(f"q145 {tag}")
        t0 = time.time()
        out, handles = substring_dedup_variant(
            d, k=20, use_hash=False, persist_occ=persist_occ
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        for h in handles:
            h.unpersist()
        spark.sparkContext.setJobDescription(None)
        return dt

    run("warmup", False)
    res = {"A_recompute": [], "B_persist": []}
    for _ in range(reps):
        res["A_recompute"].append(run("A recompute", False))
        res["B_persist"].append(run("B persist", True))
    for k, v in res.items():
        print(
            f"{k}: min {min(v):.3f} med {sorted(v)[len(v)//2]:.3f} "
            f"all {[round(x, 3) for x in v]}"
        )


if __name__ == "__main__":
    main()
