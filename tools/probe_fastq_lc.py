"""Multi-executor identity probe for the byte-range FASTQ reader.

The ranged reader's tasks ``open()`` their file path executor-side
(sources.read_fastq_ranged path contract), which r12 proved correct only
single-JVM. This probe runs the SAME >256 MiB adversarial file (every
quality line starts with '@') through read_fastq_ranged on
``local-cluster[2,8,8192]`` — two real executor JVMs, separate
processes — and on ``local[8]``, and compares an order-independent
content digest: (record count, total bases, XOR and SUM of
xxhash64(id || '\\x00' || sequence || qualities)). Any lost, duplicated,
torn, or mis-resynced record moves the digest.

    python tools/probe_fastq_lc.py [target_mb]

Prints one JSON line: {"match": true, ...} — recorded in SCALE.md r13.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def digest(spark, path):
    from pyspark.sql import functions as F

    from fireworks_spark.sources import read_fastq_ranged

    df = read_fastq_ranged(spark, [path])
    row = df.select(
        F.xxhash64(
            F.concat_ws("\x00", "ids", "sequences", "qualities")
        ).alias("h"),
        F.length("sequences").alias("n"),
    ).agg(
        F.count(F.lit(1)).alias("records"),
        F.sum("n").alias("bases"),
        # decimal(38,0): a long sum of ~1.6M xxhash64 values overflows
        F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
        # XOR-fold via sum of two halves is not associative-safe in SQL;
        # bit_xor is: order-independent and collision-moving
        F.expr("bit_xor(h)").alias("hxor"),
    ).collect()[0]
    return {
        "records": row["records"],
        "bases": int(row["bases"]),
        "hsum": str(row["hsum"]),
        "hxor": int(row["hxor"]),
    }


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    path = f"/tmp/fw_fastq_probe_{target_mb}mb.fastq"
    if not os.path.exists(path):
        rec = "@r{i} synthetic read {i}\n{seq}\n+\n@{qual}\n"
        seq = "ACGTACGTAGCTAGCTTGCA" * 10  # 200 bases
        qual = "I" * 199  # '@' + 199 quality chars == 200
        with open(path, "w") as fh:
            i, written = 0, 0
            while written < target_mb << 20:
                s = rec.format(i=i, seq=seq, qual=qual)
                fh.write(s)
                written += len(s)
                i += 1

    from fireworks_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for label, master in (
        ("local", "local[8]"),
        ("local_cluster", "local-cluster[2,8,8192]"),
    ):
        # executor JVMs are separate processes: ship the repo on their
        # Python path so module-by-reference pickles resolve
        spark = get_spark(
            app_name=f"fw-fastq-lc-{label}",
            master=master,
            extra_conf={
                "spark.executorEnv.PYTHONPATH": repo,
                "spark.executorEnv.PYSPARK_PYTHON": sys.executable,
            },
        )
        spark.sparkContext.setLogLevel("WARN")
        try:
            results[label] = digest(spark, path)
        finally:
            spark.stop()

    match = results["local"] == results["local_cluster"]
    print(
        json.dumps(
            {
                "match": match,
                "file_mb": round(os.path.getsize(path) / (1 << 20), 1),
                **{k: v for k, v in results.items()},
            }
        )
    )
    sys.exit(0 if match else 1)


if __name__ == "__main__":
    main()
