"""Throughput probe: wholetext vs byte-range FASTQ read on one large file.

Generates a single multi-hundred-MB synthetic FASTQ (adversarial: every
quality line starts with '@'), then times read_fastq's two paths end-to-end
(count + sum of sequence lengths, so every record is parsed). Evidence for
SCALE.md round 12; the identity of the two paths is pinned by
tests/test_sources.py::test_fastq_ranged_matches_wholetext_adversarial.

    python tools/probe_fastq_ranged.py [target_mb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    from pyspark.sql import functions as F

    from fireworks_spark.session import get_spark
    from fireworks_spark.sources import (
        _read_fastq_wholetext,
        read_fastq_ranged,
    )

    path = f"/tmp/fw_fastq_probe_{target_mb}mb.fastq"
    if not os.path.exists(path):
        rec = "@r{i} synthetic read {i}\n{seq}\n+\n@{qual}\n"
        seq = "ACGTACGTAGCTAGCTTGCA" * 10  # 200 bases
        qual = "I" * 199                   # '@' + 199 = 200 quality chars
        with open(path, "w") as fh:
            i, written = 0, 0
            while written < target_mb << 20:
                s = rec.format(i=i, seq=seq, qual=qual)
                fh.write(s)
                written += len(s)
                i += 1
    size_mb = os.path.getsize(path) / (1 << 20)
    spark = get_spark(app_name="fw-fastq-probe")
    spark.sparkContext.setLogLevel("WARN")

    def run(df):
        t0 = time.perf_counter()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("sequences")).alias("bases"),
        ).collect()[0]
        return time.perf_counter() - t0, row["n"], row["bases"]

    for label, df in (
        ("wholetext", _read_fastq_wholetext(spark, path)),
        ("ranged-256MiB", read_fastq_ranged(spark, [path])),
        ("ranged-32MiB", read_fastq_ranged(spark, [path],
                                           chunk_bytes=32 << 20)),
    ):
        for rep in range(2):
            dt, n, bases = run(df)
            print(
                f"{label} rep{rep}: {dt:.2f}s  {n} records  "
                f"{bases} bases  {size_mb / dt:.0f} MB/s  "
                f"parts={df.rdd.getNumPartitions()}",
                flush=True,
            )


if __name__ == "__main__":
    main()
