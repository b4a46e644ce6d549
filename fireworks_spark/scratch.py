"""Ephemeral scratch-directory allocation for staged fixtures and
throwaway checkpoints.

Prefers a RAM-backed tmpfs when one is mounted: the roundtrip/replay
harnesses stage small files and the parquet/text committers fsync each
one — this host's ext4 charges ~9 ms per fsynced small file vs ~0.1 ms
on tmpfs (200-file probe, round 15), so staging on disk made the
filesystem, not the operator under test, a visible term of every
roundtrip query. Override with ``FIREWORKS_SCRATCH_DIR``; falls back to
the normal tempdir when no tmpfs exists.

Scale note (guide §6): this is the test/dev analog of pointing scratch
I/O at fast local storage. Durable outputs — anything that must survive
the process — belong on real storage; every caller here removes its
directory in a ``finally``.
"""

from __future__ import annotations

import os
import tempfile


def scratch_dir(prefix: str = "fw_scratch_") -> str:
    base = os.environ.get("FIREWORKS_SCRATCH_DIR")
    if base is None and os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ):
        base = "/dev/shm"
    if base is not None and not os.path.isdir(base):
        base = None
    return tempfile.mkdtemp(prefix=prefix, dir=base)
