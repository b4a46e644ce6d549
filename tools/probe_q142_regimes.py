#!/usr/bin/env python
"""q142 domain_overlap regime A/B (VERDICT r15 #3 "Done =" criteria):
alternate the multi-scan and single-scan regimes in one warm session at a
given SF dir, print per-rep wall seconds + row-level parity.

    SPARK_GRAFT_CPUS=32 python tools/probe_q142_regimes.py <sf_dir> [--reps N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FIREWORKS_SCRATCH_WAREHOUSE", "1")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fireworks_spark.operators import dedup, textstats
    from fireworks_spark.session import get_spark
    from fireworks_spark.tables import table

    spark = get_spark(
        app_name="probe-q142",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if str(cpus).isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, sf_dir, "documents")
    d.count()  # warm scan

    def run(single):
        out = textstats.domain_overlap(d, single_scan=single).orderBy(
            "src_a", "src_b"
        )
        out.write.format("noop").mode("overwrite").save()
        dedup.release_caches(out)
        spark.catalog.clearCache()
        return out

    # parity first
    multi = {
        (r.src_a, r.src_b): r.jac
        for r in textstats.domain_overlap(d, single_scan=False).collect()
    }
    sdf = textstats.domain_overlap(d, single_scan=True)
    single = {(r.src_a, r.src_b): r.jac for r in sdf.collect()}
    dedup.release_caches(sdf)
    spark.catalog.clearCache()
    print(
        f"parity: {'OK' if multi == single else 'MISMATCH'} "
        f"({len(multi)} pairs)",
        flush=True,
    )

    for single_scan in (False, True):  # warm both (unrecorded)
        run(single_scan)
    for rep in range(reps):
        for tag, single_scan in (("multi", False), ("single", True)):
            t0 = time.perf_counter()
            run(single_scan)
            print(
                f"rep{rep} {tag}-scan: {time.perf_counter() - t0:.3f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
