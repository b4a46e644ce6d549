"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (exact; the query side is broadcast so the
big side never shuffles). Scale paths: sign-projection LSH bucketing and a
label-partitioned IVF-style probe — both turn the crossJoin into an equi-join
on a bucket key, which is what survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fireworks_spark.functions.vector import (
    band_key,
    cosine_similarity,
    dot,
    sign_bits,
)


def cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (brute force).

    queries is broadcast (small by construction); the base table streams
    through map-side — no shuffle until the per-query top-k, which is a
    window over qid bounded at k rows per query by WindowGroupLimit.
    Ordering is total: (rounded sim desc, neighbor id).
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    b = base.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )


def _sign_bucket(vec_col: str, num_bits: int) -> F.Column:
    """Single random-hyperplane LSH bucket id: the num_bits sign bits packed
    into one integer (see functions.vector.sign_bits — deterministic
    xxhash64-derived projections, no driver state)."""
    return band_key(sign_bits(vec_col, num_bits), 0, num_bits)


def lsh_bucket_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k searching only the query's sign-projection bucket.

    The crossJoin becomes an equi-join on the bucket id: at scale each of the
    2^num_bits buckets holds ~N/2^bits vectors and the shuffle is hash
    partitioned by bucket. Recall < 1 by construction (probe only 1 bucket);
    raise recall by lowering num_bits or probing neighboring buckets.
    """
    bb = base.withColumn("bucket", _sign_bucket(vec_col, num_bits)).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "bucket"
    )
    qb = queries.withColumn("bucket", _sign_bucket(vec_col, num_bits)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket"
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        bb.join(F.broadcast(qb), "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
) -> DataFrame:
    """IVF-style probe: centroids = per-partition mean vectors (one agg
    pass); each query searches only its nprobe nearest partitions.

    On a real corpus the partition would come from k-means; here any coarse
    partition column works. Centroid count is tiny → both centroid join and
    query assignment are broadcasts; the only big shuffle is the final
    per-query top-k window.
    """
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col).cast("array<double>")) - 1)
    # centroid per partition: element-wise mean via posexplode + groupBy
    exploded = base.select(
        F.col(partition_col).alias("pt"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"),
    )
    centroids = (
        exploded.groupBy("pt", "d")
        .agg(F.avg("x").alias("m"))
        .groupBy("pt")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
        .select("pt", F.expr("transform(dm, s -> s.m)").alias("cv"))
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    qc = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "qid", "qv", "pt", cosine_similarity(F.col("qv"), F.col("cv")).alias("cs")
        )
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cs"), F.col("pt"))
    probe = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qv", "pt")
    )
    b = base.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
        F.col(partition_col).alias("pt"),
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        b.join(F.broadcast(probe), "pt")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )
