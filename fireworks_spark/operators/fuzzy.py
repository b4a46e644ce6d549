"""Fuzzy (edit-distance) join — entity resolution over string keys.

Blocking is the whole problem at scale: a naive fuzzy join is a cartesian
product with a levenshtein filter. The deletion-neighborhood trick
(the SymSpell blocking scheme, public domain) makes edit-distance <= 1
joins EXACT with a plain equi-join: for every string emit the string plus
its |s| one-character-deletion variants; two strings at edit distance <= 1
(one substitution, insertion, or deletion) ALWAYS share at least one
variant — s itself for equality, the deletion result for insert/delete,
and the common del-1 variant for substitution. So:

- candidate generation = equi-join on the variant key: each side explodes
  to |s|+1 narrow (id, key) rows; the shuffle is a hash join on selective
  whole-string-shaped keys (no df-cap needed — key frequency is bounded by
  genuine near-duplicate mass, not by vocabulary);
- verification = the built-in JVM ``levenshtein`` on the candidate pairs
  only (insert/delete/substitute each cost 1, the same definition DuckDB's
  ``levenshtein`` uses — which is what makes q127 value-checkable);
- recall is exactly 1 by construction — unlike n-gram blocking there is no
  capped-posting miss case to argue about.

Cost: |s|+1 keys per row per side. The 100 TB shape is two narrow
explodes, one equi-join, one distinct, one small verify join — every step
shuffles on a key, nothing is quadratic. Higher radii (k deletions for
distance k) square the key count per level; k=1 covers the
dirty-data-to-canonical join this exists for, and larger radii should use
the n-gram/minhash candidates in operators/dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_keys(s: F.Column) -> F.Column:
    """array<string>: the string plus all one-character-deletion variants.
    ``s`` must be a projected attribute (not an inline expression) — it is
    referenced once per deletion inside the lambda, and expressions inside
    one Project share nothing (see BASELINE.md on HOF-lambda CSE)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )
    return F.array_append(dels, s)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 1,
) -> DataFrame:
    """Exact edit-distance join: (left_id, right_id, dist) for every pair
    with levenshtein(left_text, right_text) <= max_dist. Only max_dist=1
    has the exact deletion-neighborhood blocking; see module docstring."""
    if max_dist != 1:
        raise NotImplementedError(
            "deletion-neighborhood blocking is exact for max_dist=1 only; "
            "use dedup.jaccard_pairs / minhash for looser similarity"
        )
    L = left.select(
        F.col(left_id).alias("lid"), F.col(left_text).alias("ls")
    )
    R = right.select(
        F.col(right_id).alias("rid"), F.col(right_text).alias("rs")
    )
    lk = L.select(
        "lid", "ls", F.explode(_deletion_keys(F.col("ls"))).alias("key")
    )
    rk = R.select(
        "rid", "rs", F.explode(_deletion_keys(F.col("rs"))).alias("key")
    )
    cand = (
        lk.join(rk, "key")
        .select("lid", "rid")
        .distinct()
    )
    dist = F.levenshtein(F.col("ls"), F.col("rs"))
    return (
        cand.join(L, "lid")
        .join(R, "rid")
        .select("lid", "rid", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )
