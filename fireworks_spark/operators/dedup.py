"""Deduplication operators for large-scale training-data pipelines.

Exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — each expressed with built-in DataFrame ops (no Python UDFs in any
hot path), so every stage shuffles on a key Catalyst understands and scales
by partitioning:

- shingling/hashing: per-row narrow expressions (xxhash64, transform)
- candidate generation: equi-joins on shingle/band/bucket keys — the shuffle
  is bounded by the band key cardinality, never all-pairs
- verification: joins restricted to candidate ids only

At 100 TB you run MinHash-LSH (linear scans + banded equi-join); the exact
all-pairs operators exist for verification and for small/medium tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fireworks_spark.functions.text import normalize_text, words
from fireworks_spark.functions.vector import cosine_similarity


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (JVM-side transform over a sequence of
    start offsets; element_at is 1-based)."""
    w = words(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) with distinct shingles per document."""
    return (
        df.filter(F.size(words(text_col)) >= n)
        .select(id_col, F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("shingle"))
    )


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text; keeps the minimum id
    as the representative (hash-groupBy — one shuffle on the 128-bit key,
    partial agg does the heavy lifting map-side)."""
    return (
        df.select(id_col, F.md5(normalize_text(text_col)).alias("h"))
        .groupBy("h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
        .drop("h")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verification-grade)
# --------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs (ida < idb) with word-n-gram Jaccard >= threshold.

    Intersections come from a self-equi-join on the shingle key (the shuffle
    key is the shingle, so only documents sharing a shingle ever meet — NOT
    an all-pairs crossJoin). ``candidates`` (ida, idb) restricts the join to
    an LSH candidate set for the scale path.
    """
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("ida"), F.col("shingle"))
    b = sh.select(F.col(id_col).alias("idb"), F.col("shingle"))
    if candidates is not None:
        cand = candidates.select("ida", "idb").distinct()
        a = a.join(cand.select("ida").distinct(), "ida", "left_semi")
        b = b.join(cand.select("idb").distinct(), "idb", "left_semi")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(cand, ["ida", "idb"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("ida"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col(id_col).alias("idb"), F.col("sz").alias("sb"))
    jac = F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
    return (
        inter.join(sa, "ida")
        .join(sb, "idb")
        .select("ida", "idb", F.round(jac, 3).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the 100 TB path)
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """One row per document with columns h0..h{k-1} = min over shingles of
    xxhash64(k, shingle). All k mins compute in ONE aggregation pass — a
    single shuffle on the document id."""
    sh = shingle_table(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.lit(k), F.col("shingle"))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id, band_idx, band_key): one row per band, key = hash of the band's
    signature slice. Docs colliding on (band_idx, band_key) are candidates."""
    num_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_key"),
            )
            for b in range(num_bands)
        ]
    )
    return sig.select(id_col, F.explode(bands).alias("bd")).select(
        id_col, F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_key").alias("band_key")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    rows_per_band: int = 2,
    n: int = 3,
) -> DataFrame:
    """Candidate pairs from banded MinHash — equi-join on (band_idx, band_key)
    so the shuffle groups only same-bucket docs; never all-pairs."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, n)
    bd = lsh_bands(sig, id_col, num_hashes, rows_per_band)
    a = bd.select(F.col(id_col).alias("ida"), "band_idx", "band_key")
    b = bd.select(F.col(id_col).alias("idb"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    rows_per_band: int = 2,
    n: int = 3,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard >= threshold — the standard
    minhash dedup pipeline (candidates are a tiny fraction of all pairs, so
    the verify join is cheap)."""
    cand = minhash_lsh_candidates(df, id_col, text_col, num_hashes, rows_per_band, n)
    return jaccard_pairs(df, threshold, id_col, text_col, n, candidates=cand)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens weighted by term frequency.

    Token hash bits are exploded to (id, bit, ±weight) rows and re-packed —
    two shuffles on (id, bit) / id; all expressions JVM-side."""
    toks = (
        df.select(id_col, F.explode(words(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.xxhash64("tok"))
    )
    contrib = toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(0, 63), b -> struct(b as b, "
                "IF((shiftright(h, b) & 1) = 1, cnt, -cnt) as c))"
            )
        ).alias("bc"),
    ).select(id_col, F.col("bc.b").alias("b"), F.col("bc.c").alias("c"))
    return (
        contrib.groupBy(id_col, "b")
        .agg(F.sum("c").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.expr("IF(s > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))")
            ).alias("simhash")
        )
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 4x16-bit band
    blocking (pigeonhole: hamming<=3 pairs share at least one exact band) —
    candidates meet on an equi-join key, then bit_count(xor) verifies."""
    sig = simhash64(df, id_col, text_col)
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.expr(
                "transform(sequence(0, 3), k -> struct(k as band_idx, "
                "(shiftright(simhash, CAST(k * 16 AS INT)) & 65535) as band_key))"
            )
        ).alias("bd"),
    ).select("id", "simhash", F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_key").alias("band_key"))
    a = bands.select(
        F.col("id").alias("ida"), F.col("simhash").alias("sha"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("id").alias("idb"), F.col("simhash").alias("shb"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb", F.expr("bit_count(sha ^ shb)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold (verification-grade; for the scale path
    use similarity.lsh_bucket_topk which blocks on sign-projection buckets)."""
    a = df.select(F.col(id_col).alias("ida"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("idb"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine_similarity(F.col("va"), F.col("vb")), 4)
    return (
        a.crossJoin(b)
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
