"""Vector (tensor-column) expressions — pure Catalyst higher-order functions.

The reference stores vectors as torch.Tensor columns (TensorMessage,
reference fireworks/core/message.py:794-1138); here they are
ARRAY<FLOAT/DOUBLE> columns and the math stays JVM-side: `zip_with` +
`aggregate` compile to Catalyst expressions, so no Python worker is involved
and the same expressions run unchanged on a 1000-executor cluster.

Determinism note: `aggregate` is a strict left fold, so float summation order
is fixed — required for oracle-differential checks (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product of two array columns (double precision)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = dot / (|a| * |b|); computed as dot/(sqrt(na)*sqrt(nb))
    to mirror the oracle formula exactly."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bits(
    vec_col: Column | str,
    num_bits: int,
    portable: bool = False,
    dim: int | None = None,
) -> Column:
    """ARRAY<INT> of ``num_bits`` random-hyperplane sign bits.

    Bit i is the sign of a pseudo-random ±1 projection whose signs derive
    from xxhash64(i, dim) — deterministic, shippable in the plan, no driver
    state or broadcast needed. P(bit agrees for two vectors at angle θ) =
    1 - θ/π, the standard sign-LSH collision probability.

    ``portable=True`` derives the projection signs from md5(i:d) parity
    instead — the same value any SQL engine computes (DuckDB:
    ``('0x' || substring(md5(i || ':' || d), 1, 15))::BIGINT % 2``), which
    is what lets an LSH-bucketed ANN be value-checked end-to-end by a SQL
    oracle (q102). Same collision probability; md5 costs ~2x xxhash64 per
    (bit, dim) term, so the default stays on xxhash64.

    ``dim`` (the known vector dimensionality — every real ANN index
    declares it, like FAISS's d) switches to the fast path: the ±1 matrix
    is built from LITERAL-indexed hash expressions, so ConstantFolding
    collapses it to plain literals at optimization time and each row pays
    only the zip_with multiply-fold — instead of re-hashing num_bits x dim
    (i, d) pairs PER ROW, which the lambda-variable form forces (lambda
    vars are never foldable; measured ~2s of pure hashing on 5000 x 64
    vectors with the md5 variant). Bit values are identical either way.
    """
    v = _dbl(vec_col)
    if portable:
        def _sgn(i, d):
            h = F.conv(
                F.substring(F.md5(F.concat_ws(":", i, d)), 1, 15), 16, 10
            ).cast("long")
            return F.when((h % 2) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    else:
        def _sgn(i, d):
            return F.when(
                (F.xxhash64(i, d) % 2) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0))
    if dim is not None and portable:
        # The md5 parity is computable in plain Python (hashlib md5 of the
        # same "i:d" string), so the whole ±1 matrix becomes num_bits flat
        # list-literals — ONE py4j call each. Building the matrix from
        # per-entry Column expressions instead (num_bits x dim md5/conv/
        # substring Column objects) costs thousands of py4j round-trips at
        # DataFrame-construction time: measured ~10s per query build, more
        # than the per-row hashing it was meant to save. Execution-side the
        # flat literals run the zip_with fold only: 0.7s vs 3.0s per-row on
        # 5000 x 64 at local[32]. Bit values are identical (parity-tested).
        import hashlib

        def _psgn(i: int, d: int) -> float:
            h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16)
            return 1.0 if h % 2 == 0 else -1.0

        if isinstance(vec_col, str):
            # One JVM-side parse instead of num_bits DSL folds: even with
            # flat list-literals, each bit's zip_with/aggregate/when chain
            # is ~10 py4j round-trips, and building this column twice per
            # query (base + probe side) measured 0.64s x 2 at 6 bits —
            # ~85% of q102/q184's total cost (r16 construction profile).
            # The SQL text parses to the exact expressions the DSL built
            # (same left-fold, same literals), so bit values are
            # unchanged (parity-tested in tests/test_similarity.py).
            vexpr = "CAST(`{}` AS ARRAY<DOUBLE>)".format(
                vec_col.replace("`", "``")
            )
            bit_sql = []
            for i in range(num_bits):
                row = "array({})".format(
                    ",".join(
                        "1.0D" if _psgn(i, d) > 0 else "-1.0D"
                        for d in range(dim)
                    )
                )
                bit_sql.append(
                    "(CASE WHEN aggregate(zip_with({v}, {row}, "
                    "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x) > 0 "
                    "THEN 1 ELSE 0 END)".format(v=vexpr, row=row)
                )
            return F.expr("array({})".format(",".join(bit_sql)))
        bits = []
        for i in range(num_bits):
            row = F.lit([_psgn(i, d) for d in range(dim)])
            s = F.aggregate(
                F.zip_with(v, row, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(s > 0, F.lit(1)).otherwise(F.lit(0)))
        return F.array(*bits)
    # non-portable dim is not special-cased: xxhash64 isn't reproducible
    # driver-side without reimplementing it, and the at-scale answer for
    # the default path is the numpy-matmul banding the dedup operators use
    # (operators/dedup.py embedding LSH) — fall through to per-row hashing.
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bits - 1)),
        lambda i: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.transform(
                        F.sequence(F.lit(0), F.size(v) - 1),
                        lambda d: _sgn(i, d),
                    ),
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def band_key(bits: Column, band_idx: int, rows_per_band: int) -> Column:
    """Integer key packing bits[band_idx*r : (band_idx+1)*r] (slice 1-based)."""
    return F.aggregate(
        F.slice(bits, band_idx * rows_per_band + 1, rows_per_band),
        F.lit(0),
        lambda acc, b: acc * 2 + b,
    )
