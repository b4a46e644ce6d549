"""Ephemeral scratch-directory allocation for staged fixtures and
throwaway checkpoints.

Prefers a RAM-backed tmpfs when one is mounted: the roundtrip/replay
harnesses stage small files and the parquet/text committers fsync each
one — this host's ext4 charges ~9 ms per fsynced small file vs ~0.1 ms
on tmpfs (200-file probe, round 15), so staging on disk made the
filesystem, not the operator under test, a visible term of every
roundtrip query. Override with ``FIREWORKS_SCRATCH_DIR``; falls back to
the normal tempdir when no tmpfs exists or when the tmpfs is low on
free space (ADVICE r15: an ENOSPC mid-stage would read as an operator
bug — statvfs-check before choosing RAM).

Scale note (guide §6): this is the test/dev analog of pointing scratch
I/O at fast local storage. Durable outputs — anything that must survive
the process — belong on real storage; every caller here removes its
directory in a ``finally``.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

# Staged fixtures are MBs; sf3-scale copies reach a few hundred MB. Only
# choose the RAM filesystem when it clearly has room for the largest
# staging this repo does, with executor headroom left over.
MIN_TMPFS_FREE_BYTES = 4 * 1024**3


def _tmpfs_base() -> "str | None":
    base = os.environ.get("FIREWORKS_SCRATCH_DIR")
    if base is None and os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= MIN_TMPFS_FREE_BYTES:
                base = "/dev/shm"
        except OSError:
            pass
    if base is not None and not os.path.isdir(base):
        base = None
    return base


def scratch_dir(prefix: str = "fw_scratch_") -> str:
    return tempfile.mkdtemp(prefix=prefix, dir=_tmpfs_base())


_WAREHOUSE: "str | None" = None


def warehouse_dir() -> str:
    """One scratch warehouse path per process, created lazily and removed
    at exit. get_spark used to mkdtemp a fresh ``fw_warehouse_*`` on
    EVERY call — even when getOrCreate returned an existing session and
    the config was ignored — leaking directories across invocations
    (ADVICE r15)."""
    global _WAREHOUSE
    if _WAREHOUSE is None:
        _WAREHOUSE = scratch_dir("fw_warehouse_")
        atexit.register(shutil.rmtree, _WAREHOUSE, ignore_errors=True)
    return _WAREHOUSE
