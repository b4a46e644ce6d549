"""Text normalization/tokenization expressions (JVM-side).

Covers the reference's tokenizer helpers (space_tokenizer/character_tokenizer,
reference fireworks/toolbox/text.py:7-28) as Catalyst expressions rather than
Python functions — the hot path for 100 TB of documents must not cross into
Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse whitespace — canonical form for dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def words(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text (space_tokenizer,
    reference fireworks/toolbox/text.py:22-28)."""
    return F.split(normalize_text(col), " ")


def chars(col: Column | str) -> Column:
    """Character tokenization (character_tokenizer, reference
    fireworks/toolbox/text.py:7-20)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "")


def pad(col: Column | str, length: int, value: str = "<pad>") -> Column:
    """Pad/truncate a token array to a fixed length (pad/pad_sequence,
    reference fireworks/toolbox/text.py:37-55): truncate past ``length``,
    right-pad shorter arrays with ``value``. Pure expression — slice +
    array_repeat, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.slice(c, 1, length)
    missing = (F.lit(length) - F.size(head)).cast("int")
    return F.concat(head, F.array_repeat(F.lit(value), missing))
