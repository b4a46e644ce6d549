"""Measured scaling probe for the fuzzy (edit-distance) join at radii 1
and 2: part names replicated 1x/4x/16x with shifted keys, dirty side =
5% of rows with two characters deleted. Results land in SCALE.md's
'Measured scaling' section."""
import time

from pyspark.sql import functions as F

from fireworks_spark.operators.fuzzy import fuzzy_join
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table

spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"


def replicate(df, k):
    r = spark.range(k).select(F.col("id").alias("_copy"))
    return (
        df.crossJoin(F.broadcast(r))
        .withColumn(
            "p_partkey",
            F.col("p_partkey") + F.col("_copy") * F.lit(10_000_000),
        )
        .drop("_copy")
    )


base = table(spark, sf, "part").select(
    "p_partkey", F.lower("p_name").alias("nm")
)


def probe(p, max_dist):
    d1 = p.filter(F.col("p_partkey") % 20 == 0).select(
        "p_partkey",
        F.concat(
            F.col("nm").substr(F.lit(1), F.lit(2)),
            F.col("nm").substr(F.lit(4), F.length("nm")),
        ).alias("s"),
    )
    dam = d1.select(
        "p_partkey",
        F.concat(
            F.col("s").substr(F.lit(1), F.lit(6)),
            F.col("s").substr(F.lit(8), F.length("s")),
        ).alias("dm"),
    )
    return fuzzy_join(dam, p, "p_partkey", "p_partkey", "dm", "nm", max_dist)


for k in (1, 4, 16):
    p = replicate(base, k).persist()
    n = p.count()
    for dist in (1, 2):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            probe(p, dist).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"fuzzy_join dist={dist} {k}x ({n} rows): {best:.2f}s")
    p.unpersist()
