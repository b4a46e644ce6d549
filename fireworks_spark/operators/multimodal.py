"""Multimodal columns: image/audio/video as opaque BINARY columns with typed
metadata, decoded/feature-extracted inside Arrow-batched Python stages.

Design (builder brief): the engine-side contract is (a) media bytes travel
as a BinaryType column next to its metadata, (b) metadata extraction stays
JVM-side (length, hashes, magic-byte sniffing are Catalyst expressions over
binary), (c) anything that needs a codec (decode, resize, frame-sample) is a
``mapInPandas`` stage so bytes cross into Python once per Arrow batch, not
per row. The codec libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the decode kernels are deterministic stand-ins behind the same
signatures — the Spark-side plumbing (schema, batching, partitioning) is the
real, tested part; swap ``_decode_bytes`` for a real decoder to go live.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes -> format label (JVM-side sniffing on hex)
_MAGIC = {
    "FFD8FF": "jpeg",
    "89504E47": "png",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "494433": "mp3",
    "000000": "mp4ish",
}


def sniff_format(bin_col: Column | str) -> Column:
    """Magic-byte format label from the first bytes — pure expression, no
    Python. Unknown prefixes -> 'unknown'."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    head = F.upper(F.hex(F.substring(c, 1, 4)))
    out = F.lit("unknown")
    for prefix, label in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        out = F.when(head.startswith(prefix), F.lit(label)).otherwise(out)
    return out


def with_media_meta(
    df: DataFrame, bin_col: str = "media", id_cols: list[str] | None = None
) -> DataFrame:
    """Typed metadata for a binary media column: byte size, md5 fingerprint,
    sniffed format. All Catalyst expressions — runs at scan speed; this is
    the cheap pass you run over 100 TB before deciding what to decode."""
    keep = id_cols if id_cols is not None else [c for c in df.columns if c != bin_col]
    return df.select(
        *keep,
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_md5"),
        sniff_format(bin_col).alias("format"),
    )


def _decode_bytes(raw: bytes, dim: int) -> list[float]:
    """STAND-IN decode kernel: deterministic pseudo-features from the md5 hex
    of the bytes (ord(c)/100 per hex char). A real deployment replaces this
    with e.g. PIL decode + embedding; the signature and batch shape stay."""
    h = hashlib.md5(raw).hexdigest()
    return [ord(h[j]) / 100.0 for j in range(dim)]


def extract_features(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched Python stage
    (mapInPandas): bytes reach Python once per batch; output is
    (id, f0..f{dim-1}). Embarrassingly parallel over partitions — decode
    throughput scales with executors, which is the whole point of running
    media pipelines on Spark."""
    cols = ", ".join(f"f{j} double" for j in range(dim))
    schema = f"{id_col} long, {cols}"

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [_decode_bytes(bytes(r), dim) for r in b[bin_col]]
            out = pd.DataFrame(
                {id_col: b[id_col].to_numpy()}
                | {f"f{j}": [f[j] for f in feats] for j in range(dim)}
            )
            yield out

    return df.select(id_col, bin_col).mapInPandas(_gen, schema=schema)


def frame_sample(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    every_n: int = 10,
):
    """Video frame sampling requires a codec; not available in this
    environment. The real implementation is the same mapInPandas shape as
    extract_features with a decoder emitting one row per sampled frame
    (mapInPandas naturally changes cardinality)."""
    raise NotImplementedError(
        "frame_sample needs a video codec library on the executors; "
        "see extract_features for the batch plumbing it plugs into"
    )
