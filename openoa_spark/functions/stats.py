"""Numerically-deterministic aggregation helpers.

Floating-point SUM/AVG over a shuffled dataset is order-dependent:
partial aggregates combine in nondeterministic order, so two runs (or
two engines) can differ in the last few ulps. For an engine whose
results are checked hash-exact against an external oracle — and whose
100 TB production runs should be reproducible — we sum *decimals*:
decimal addition is exact and associative, so the result is
bit-identical regardless of partitioning, parallelism, or engine.

A double→decimal(p,s) cast rounds to nearest; because no finite binary
double lies exactly on a decimal midpoint for s ≥ 3, every engine's
nearest-rounding agrees, making the whole pipeline cross-engine exact.
Cost: decimal sum is ~2× a double sum — negligible next to shuffle I/O.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 4, precision: int = 20) -> Column:
    """Order-independent exact sum of a double column.

    Rounds each value to ``scale`` decimal digits (exactly), sums in
    decimal space, returns double. Use for money/energy-like measures.
    """
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6, precision: int = 20) -> Column:
    """Order-independent mean: exact decimal sum / count of non-nulls."""
    c = _c(col)
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


def rounded(col: Column | str, digits: int = 6) -> Column:
    """Round a float expression whose value may differ across engines
    in the last ulps (libm trig/exp, multi-pass variance): 1-ulp input
    noise is ~1e-15 relative, far below the 1e-6 grid, so rounding
    makes the output deterministic with negligible boundary risk."""
    return F.round(_c(col).cast("double"), digits)


def sql_dsum(expr: str, scale: int = 4, precision: int = 20) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6, precision: int = 20) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )
