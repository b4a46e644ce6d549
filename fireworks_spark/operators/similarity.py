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


def _l2_normalized(vec_col: str) -> F.Column:
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(dot(v, v))
    return F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    num_clusters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer (spherical k-means).

    Train: Spark ML KMeans over L2-normalized vectors (euclidean k-means on
    the unit sphere == cosine k-means); at corpus scale pass ``fit_fraction``
    to train on a sample — the centroids, not the fit set, define the index.
    Index: one JVM pass (model.transform) assigns every vector its nearest
    centroid — the inverted list id. Search: each query ranks the tiny
    broadcast centroid table, probes its ``nprobe`` nearest lists via an
    equi-join on the centroid id, then exact top-k within the probed lists.
    ``nprobe == num_clusters`` degrades gracefully to exact brute force
    (asserted in tests/test_similarity.py, alongside the partial-probe
    recall bound).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base_n = base.withColumn("_fv", array_to_vector(_l2_normalized(vec_col)))
    fit_df = (
        base_n.sample(fit_fraction, seed=seed) if fit_fraction else base_n
    )
    model = KMeans(
        k=num_clusters, seed=seed, featuresCol="_fv", predictionCol="_pt",
        maxIter=8,  # coarse quantization converges in a few sweeps; keep
        # k-means|| init (random init can merge well-separated clusters)
    ).fit(fit_df)
    assigned = model.transform(base_n).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), F.col("_pt").alias("pt")
    )
    centroids = base.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "pt int, cv array<double>",
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "qid", "qv", "pt", cosine_similarity(F.col("qv"), F.col("cv")).alias("cs")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cs"), F.col("pt"))
    probe = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qv", "pt")
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 4)
    pairs = (
        assigned.join(F.broadcast(probe), "pt")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )
