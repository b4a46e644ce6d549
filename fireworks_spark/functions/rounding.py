"""Engine-portable decimal rounding.

Spark's ``F.round`` on DOUBLE goes through ``BigDecimal.valueOf``, i.e.
the value's SHORTEST decimal string: 199/40 = 4.9749999999999996447...
prints as "4.975" and half-up rounds to 4.98. Engines that round the true
binary value (DuckDB ``round()``, numpy, C) give 4.97 for the same input.
Any rounded INTEGER QUOTIENT (ratios, fractions-of-counts, exact Jaccard)
can land on such a boundary, and the divergence scales with row count —
the round-9 sf1 sweep caught it twice in 50k documents (q38).

``pround(col, k)`` = floor(x * 10^k + 0.5) / 10^k evaluates as plain IEEE
double arithmetic, so it is bit-identical on every engine when the oracle
SQL uses the literal same floor expression — THAT is the guarantee, not
"true-value half-up": for k >= ~6 the product x*10^k + 0.5 can itself
round across a representable-double boundary before floor sees it, so
near-boundary inputs may round the "wrong" way on both engines in the
same way. Away from such boundaries it behaves like C round() for
positive inputs; only use for non-negative quantities (ratios, similarity
scores) — for negative x it rounds half toward +inf.

Continuous float expressions (cosines, log scores) hit .5-at-k-decimals
boundaries with probability ~0 and may keep ``F.round``; every rounded
integer quotient should use this instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(x: Column, scale: int) -> Column:
    """floor(x*10^scale + 0.5)/10^scale — decimal rounding that is
    bit-identical across engines when the oracle uses the same expression
    (see module docstring for why that, not true-value half-up, is the
    contract). SQL-oracle equivalent (use verbatim):
    ``floor(x * 1e{scale} + 0.5) / 1e{scale}``."""
    p = float(10**scale)
    return F.floor(x * F.lit(p) + F.lit(0.5)) / F.lit(p)


def pround_sql(expr: str, scale: int) -> str:
    """The matching DuckDB/ANSI fragment for :func:`pround`."""
    p = 10**scale
    return f"floor(({expr}) * {p} + 0.5) / {p}"
