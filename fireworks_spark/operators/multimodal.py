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
    frame_bytes: int = 64,
    every_n: int = 10,
) -> DataFrame:
    """Sample every ``every_n``-th frame of each media blob — the
    cardinality-CHANGING decode shape (one input row -> many frame rows),
    which mapInPandas expresses naturally.

    The frame SEGMENTATION here is fixed-size byte windows (real for raw/
    planar formats; a container codec would replace the segmentation, not
    the plumbing): frame k covers bytes [k*frame_bytes, (k+1)*frame_bytes).
    Emits (id, frame_idx, frame) for frame_idx = 0, every_n, 2*every_n...
    Output order within a document is frame order; partition-parallel
    across documents."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for i, raw in zip(b[id_col], b[bin_col]):
                raw = bytes(raw)
                n_frames = max(1, -(-len(raw) // frame_bytes))
                for k in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(raw[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, bin_col).mapInPandas(
        _gen, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def resize_gray(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    width: int = 32,
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """Block-average resize of a raw grayscale image (bytes = row-major
    pixels of the given width): REAL resampling math over the byte grid —
    only the container decode (jpeg/png -> raw pixels) would be a codec's
    job. Short blobs are zero-padded to a full grid; the output is the
    out_w*out_h block-mean vector (row-major), the thumbnail shape a
    vision pipeline feeds downstream.
    """
    import numpy as np

    size = out_w * out_h

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for raw in b[bin_col]:
                px = np.frombuffer(bytes(raw), dtype=np.uint8)
                h = max(1, -(-len(px) // width))
                grid = np.zeros(h * width, dtype=np.float64)
                grid[: len(px)] = px
                grid = grid.reshape(h, width)
                # block-average into an out_h x out_w thumbnail
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, width, out_w + 1).astype(int)
                thumb = [
                    float(
                        grid[ys[r]:max(ys[r + 1], ys[r] + 1),
                             xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
                    )
                    for r in range(out_h)
                    for c in range(out_w)
                ]
                out.append([round(v, 4) for v in thumb])
            yield pd.DataFrame(
                {id_col: b[id_col].to_numpy(), "thumb": out}
            )

    return df.select(id_col, bin_col).mapInPandas(
        _gen, schema=f"{id_col} long, thumb array<double>"
    )


def audio_windows(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    window_bytes: int = 256,
) -> DataFrame:
    """Fixed-size windowing + RMS energy over raw audio bytes (int8 PCM
    interpretation) — real windowed-DSP plumbing and math; a codec would
    only replace the bytes->samples step. One input row fans out to one
    row per window: (id, win_idx, n_bytes, rms)."""
    import numpy as np

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, sizes, rms = [], [], [], []
            for i, raw in zip(b[id_col], b[bin_col]):
                samples = np.frombuffer(bytes(raw), dtype=np.int8).astype(
                    np.float64
                )
                n_win = max(1, -(-len(samples) // window_bytes))
                for k in range(n_win):
                    w = samples[k * window_bytes:(k + 1) * window_bytes]
                    ids.append(i)
                    idxs.append(k)
                    sizes.append(len(w))
                    rms.append(
                        round(float(np.sqrt((w * w).mean())), 4)
                        if len(w)
                        else 0.0
                    )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "win_idx": idxs,
                    "n_bytes": sizes,
                    "rms": rms,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        _gen, schema=f"{id_col} long, win_idx int, n_bytes int, rms double"
    )


def media_blockhash(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    num_bits: int = 48,
) -> DataFrame:
    """Perceptual block hash over raw media bytes — the blockhash/aHash
    family on the byte stream: byte p (of L) belongs to block
    (p * num_bits) // L, and bit b is 1 iff block b's mean byte value is
    strictly greater than the whole stream's mean. Returns
    (id_col, phash long). Like :func:`audio_windows` this is real byte
    math (a codec would only replace the bytes->pixels step); the 48-bit
    default keeps every arithmetic step inside signed-64 range so the
    same hash is derivable in plain SQL (q147's oracle). Integer sums
    are exact in float64, so the strict-> comparison is engine-portable
    (no rounding step needed).

    Scale: one Arrow-batched pass, one hash per row out — the narrow
    signature table is what downstream joins shuffle, never the bytes.
    """
    import numpy as np

    if not 1 <= num_bits <= 62:
        raise ValueError("num_bits must be in 1..62 (signed-64 safe)")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(num_bits, dtype=np.int64)
        for b in batches:
            out = []
            for raw in b[bin_col]:
                if raw is None:
                    out.append(None)
                    continue
                a = np.frombuffer(bytes(raw), dtype=np.uint8).astype(
                    np.float64
                )
                if not len(a):
                    # an empty stream has no perceptual content: NULL, not
                    # hash 0 — hash 0 would pair every empty/flat stream
                    # with every other at Hamming 0
                    out.append(None)
                    continue
                idx = (np.arange(len(a)) * num_bits) // len(a)
                sums = np.bincount(idx, weights=a, minlength=num_bits)
                cnts = np.bincount(idx, minlength=num_bits)
                means = sums / np.maximum(cnts, 1)
                bits = ((means > a.mean()) & (cnts > 0)).astype(np.int64)
                out.append(int((bits << shifts).sum()))
            yield pd.DataFrame({id_col: b[id_col], "phash": out})

    return df.select(id_col, bin_col).mapInPandas(
        _gen, schema=f"{id_col} long, phash long"
    )


def media_dup_pairs(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    num_bits: int = 48,
) -> DataFrame:
    """Near-duplicate media pairs: block-hash every byte stream, then find
    all pairs within ``max_hamming`` via the same pigeonhole band blocking
    the text simhash uses (dedup.hamming_pairs) — candidates meet on an
    equi-join key, bit_count(xor) verifies exactly, never an all-pairs
    join. This is the dedup surface extended to the multimodal columns:
    re-encoded or lightly edited media keeps most block means, so it lands
    within a small Hamming radius of the original."""
    from fireworks_spark.operators.dedup import hamming_pairs

    # empty/NULL media carries a NULL phash (see media_blockhash) and is
    # excluded from pairing rather than colliding at Hamming 0
    sig = media_blockhash(df, bin_col, id_col, num_bits).filter(
        F.col("phash").isNotNull()
    )
    return hamming_pairs(
        sig, max_hamming, id_col=id_col, sig_col="phash", num_bits=num_bits
    )
