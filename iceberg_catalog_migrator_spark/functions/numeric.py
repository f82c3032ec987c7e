"""Deterministic numeric aggregation.

Double summation is order-dependent, and Spark's partial aggregation
order varies run to run — an oracle comparison on raw double sums would
flap. The fix used across every query in this engine:

1. per-row arithmetic stays in DOUBLE (IEEE ops are bit-identical in
   Spark and DuckDB for the same expression),
2. the row value is cast to DECIMAL just before aggregation
   (deterministic round-to-nearest of the same double in both engines),
3. SUM runs over decimals (exact, order-independent in both engines),
4. the exact decimal result is cast back to DOUBLE for the output
   column (same nearest-double in both engines).

This keeps the hot path entirely JVM-side (no UDFs) and makes results
bit-stable at any parallelism — the same property you want on a
1000-executor cluster, where partial-aggregation order is even less
deterministic than on local[32].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4, out_scale: int = 2) -> Column:
    """Order-independent SUM of a double expression via exact decimals.

    The exact decimal sum is rounded to ``out_scale`` *while still a
    decimal* and only then cast to double: a low-precision decimal
    converts to double via one correctly-rounded division in every
    engine, whereas a full-scale decimal sum can double-round (int128 →
    double → /10^s) and come out one ulp apart between engines.

    Equivalent oracle SQL:
    ``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,s))), out) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(18,{scale})")), out_scale).cast("double")


def dsum_expr(sql_expr: str, scale: int = 4, out_scale: int = 2) -> str:
    """The oracle-side rendering of :func:`dsum` (keep in sync)."""
    return (
        f"CAST(ROUND(SUM(CAST(({sql_expr}) AS DECIMAL(18,{scale}))), {out_scale}) AS DOUBLE)"
    )


def ratio(numer: Column, denom: Column, digits: int = 6) -> Column:
    """Deterministic average/ratio: double division of already-
    deterministic inputs, rounded."""
    return F.round(numer / denom, digits)
