#!/usr/bin/env python
"""q134 jaccard_join stage profile at sf1 (VERDICT r15 item 4): where do
the seconds go — candidate generation (prefix join + pair agg) vs the
verify set-join — and how skewed are the candidate pairs per doc id?
Informs whether a length-bucketed / salted verify join is worth building.

    python tools/probe_q134_profile.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FIREWORKS_SCRATCH_WAREHOUSE", "1")

from pyspark.sql import functions as F

from fireworks_spark.operators import dedup
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="probe-q134",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, sf_dir, "documents")
    left = d.filter(F.col("doc_id") % 2 == 0)
    right = d.filter(F.col("doc_id") % 2 == 1)

    def timed(tag, fn):
        spark.sparkContext.setJobDescription(f"q134 {tag}")
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        print(f"{tag}: {dt:.3f}s -> {r}", flush=True)
        spark.sparkContext.setJobDescription(None)
        return r

    # warm the scan/JIT
    timed("warm scan", lambda: d.count())

    # full query, twice (noop)
    def full():
        out = dedup.jaccard_join(left, right, threshold=0.5)
        out.write.format("noop").mode("overwrite").save()
        dedup.release_caches(out)
        return "ok"

    timed("full#1", full)
    timed("full#2", full)

    # stage splits: rebuild the internals by hand (mirrors jaccard_join)
    sl = dedup.shingle_sets(left, "doc_id", "text", 3).persist()
    sr = dedup.shingle_sets(right, "doc_id", "text", 3).persist()
    timed("shingle_sets l+r", lambda: (sl.count(), sr.count()))
    t = 0.5 - 0.0005
    k = dedup._prefix_k(0.5)
    print("prefix k =", k)
    sll = sl.select(
        F.col("doc_id").alias("lid"),
        F.size("shingles").alias("_sz"),
        F.explode("shingles").alias("shingle"),
    )
    srr = sr.select(
        F.col("doc_id").alias("rid"),
        F.size("shingles").alias("_sz"),
        F.explode("shingles").alias("shingle"),
    )
    dfreq = (
        sll.select("shingle")
        .unionAll(srr.select("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .persist()
    )
    timed("dfreq (union df agg)", lambda: dfreq.count())

    from pyspark.sql import Window

    def _prefix(sh, key, p, q):
        order = Window.partitionBy(key).orderBy("_df", "shingle")
        return (
            sh.join(dfreq, "shingle")
            .withColumn("_rn", F.row_number().over(order))
            .filter(
                F.col("_rn") <= dedup._prefix_len(F.col("_sz"), t) + F.lit(k - 1)
            )
            .filter(F.col("_df") >= 2)
            .select(key, "shingle", F.col("_rn").alias(p), F.col("_sz").alias(q))
        )

    joined_lr = (
        _prefix(sll, "lid", "_pl", "_ql")
        .join(_prefix(srr, "rid", "_pr", "_qr"), "shingle")
        .filter(F.least("_ql", "_qr") >= F.lit(t) * F.greatest("_ql", "_qr"))
    )
    alpha = F.lit(t) * (F.col("_ql") + F.col("_qr")) / F.lit(1.0 + t)
    if k == 1:
        cand = (
            joined_lr.filter(
                1
                + F.least(
                    F.col("_ql") - F.col("_pl"), F.col("_qr") - F.col("_pr")
                )
                >= alpha
            )
            .groupBy("lid", "rid")
            .agg(F.count(F.lit(1)).alias("_common"))
        )
    else:
        # extended-prefix branch (k>1) — mirrors jaccard_join
        cand = (
            joined_lr.groupBy("lid", "rid")
            .agg(
                F.count(F.lit(1)).alias("_common"),
                F.min("_ql").alias("_ql"),
                F.min("_qr").alias("_qr"),
            )
            .filter(
                F.col("_common")
                >= F.least(
                    F.lit(k), F.ceil(F.lit(t) * F.least("_ql", "_qr"))
                )
            )
            .select("lid", "rid", "_common")
        )
    cand = cand.persist()
    n_cand = timed("candidates (prefix join + pair agg)", lambda: cand.count())

    # skew: pairs per lid / rid
    top = timed(
        "pair skew",
        lambda: (
            cand.groupBy("lid").count().orderBy(F.desc("count")).limit(5).collect(),
            cand.groupBy("rid").count().orderBy(F.desc("count")).limit(5).collect(),
        ),
    )
    print("top lid:", [(r[0], r[1]) for r in top[0]])
    print("top rid:", [(r[0], r[1]) for r in top[1]])

    # post-bound survivors + verify-only time
    thr = F.lit(t)
    statl = sl.select(
        F.col("doc_id").alias("lid"), F.size("shingles").alias("_szl")
    )
    statr = sr.select(
        F.col("doc_id").alias("rid"), F.size("shingles").alias("_szr")
    )
    hotl = F.greatest(
        F.ceil(F.lit(t) * F.col("_szl")) - k, F.lit(0)
    ).cast("long")
    hotr = F.greatest(
        F.ceil(F.lit(t) * F.col("_szr")) - k, F.lit(0)
    ).cast("long")
    pruned = (
        cand.join(statl, "lid")
        .join(statr, "rid")
        .filter(F.least("_szl", "_szr") >= thr * F.greatest("_szl", "_szr"))
        .filter(
            (F.col("_common") + hotl + hotr)
            >= thr * F.greatest("_szl", "_szr")
        )
        .select("lid", "rid")
        .persist()
    )
    n_pruned = timed("pruned candidates", lambda: pruned.count())
    sa = sl.select(F.col("doc_id").alias("lid"), F.col("shingles").alias("_sa"))
    sb = sr.select(F.col("doc_id").alias("rid"), F.col("shingles").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    jac = inter / (F.size("_sa") + F.size("_sb") - inter)

    def verify():
        out = (
            pruned.join(sa, "lid")
            .join(sb, "rid")
            .select("lid", "rid", F.round(jac, 3).alias("jac"))
            .filter(F.col("jac") >= 0.5)
        )
        out.write.format("noop").mode("overwrite").save()
        return "ok"

    timed("verify join only#1", verify)
    timed("verify join only#2", verify)
    print(f"n_cand={n_cand} n_pruned={n_pruned}")
    for h in (sl, sr, dfreq, cand, pruned):
        h.unpersist()


if __name__ == "__main__":
    main()
