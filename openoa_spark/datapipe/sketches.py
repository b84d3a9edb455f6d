"""Approximate/mergeable sketch operators — the 100-TB companions to
the exact aggregates: bounded-memory distinct counts, quantiles, and
heavy hitters, plus the re-aggregatable rollup pattern (pre-aggregate
fine-grain sketches once, answer coarser-grain questions by MERGING
sketches instead of rescanning facts — the hypertable-rollup idiom).

All built on Spark's native sketch functions (Datasketches HLL,
Greenwald-Khanna quantiles, count-min): JVM-side, mergeable, no UDFs.
No DuckDB oracle twins — the two engines' sketch internals differ by
design; correctness is pinned by error-bound tests against exact
answers (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """Approximate COUNT(DISTINCT col) with relative standard
    deviation ``rsd`` (HyperLogLog++). One pass, O(1/rsd²) state."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles at the given probabilities
    (Greenwald-Khanna; rank error ≤ 1/accuracy). Returns one row with
    an array column ``quantiles`` ordered like ``probabilities``."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return df.agg(
        F.percentile_approx(col, probs, F.lit(accuracy)).alias("quantiles")
    )


def hll_rollup(
    df: DataFrame,
    value_col: str,
    grain_cols: list[str | Column],
    lg_config_k: int = 12,
) -> DataFrame:
    """Fine-grain distinct-count sketches: one Datasketches HLL per
    grain group over ``value_col``. The sketch column is binary and
    MERGEABLE — coarser grains come from :func:`hll_merge` without
    touching the fact table again (pre-aggregate daily once; answer
    monthly/yearly/total by union). Estimate per row via
    ``hll_sketch_estimate``.
    """
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("hll"),
        F.count("*").alias("n_rows"),
    )


def hll_merge(
    rollup: DataFrame,
    group_cols: list[str | Column] | None = None,
    sketch_col: str = "hll",
) -> DataFrame:
    """Merge fine-grain HLL sketches up to a coarser grain (empty
    ``group_cols`` → one global row). Output keeps the merged sketch
    (still mergeable further) plus its ``distinct_estimate``."""
    g = rollup.groupBy(*(group_cols or []))
    merged = g.agg(
        F.hll_union_agg(sketch_col).alias(sketch_col),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.withColumn(
        "distinct_estimate", F.hll_sketch_estimate(sketch_col)
    )


def frequent_items(
    df: DataFrame, col: str, support: float = 0.01
) -> DataFrame:
    """Heavy hitters with frequency ≥ ``support`` (single-pass
    Karp-Papadimitriou-Shenker via DataFrame.freqItems; may contain
    false positives, never false negatives — filter against exact
    counts downstream if needed). Returns one array row."""
    return df.freqItems([col], support)
