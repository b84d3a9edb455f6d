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


# ------------------------------------------------------- bloom filter
# Spark keeps its BloomFilterAggregate/might_contain expressions
# internal (they back InjectRuntimeFilter, not the SQL registry), so
# this is a packed-long bitmap bloom built from plain DataFrame ops:
# k positions per value via seeded xxhash64, bitmap rows (word, bits)
# with bits OR-merged per 64-bit word. The bitmap relation is at most
# m_bits/64 rows — kilobytes for typical blocklist/decontamination
# sizes — so it broadcasts (or collects to a plan literal) while the
# big probe side streams map-only. No false negatives; false-positive
# rate ~ (1 - e^{-kn/m})^k.


def bloom_positions(col: Column | str, m_bits: int, k: int) -> Column:
    """Array of the k (deduplicated) bit positions for a value.
    Seeded xxhash64 per hash function — JVM-side, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.array(
            *[F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits)) for i in range(k)]
        )
    )


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the bitmap relation ``(word: long, bits: long)`` over the
    distinct values of ``col``. One explode at position grain + one
    hash agg on word — both map-side combined; output ≤ m_bits/64
    rows regardless of input size (the whole point: a billion-gram
    blocklist compresses to a fixed-size bitmap)."""
    pos = df.select(
        F.explode(bloom_positions(col, m_bits, k)).alias("_pos")
    )
    return (
        pos.groupBy((F.col("_pos") / 64).cast("long").alias("word"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("_pos") % 64).cast("int"),
                )
            ).alias("bits")
        )
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR-merge bitmaps built with the same (m_bits, k): the bloom of
    a union is the bitwise OR of the blooms of the parts — the
    mergeable-state property that lets shards/batches build
    independently and combine without rescanning."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_collect(bloom: DataFrame, m_bits: int) -> list[int]:
    """Densify the bitmap relation into a Python list of m_bits/64
    longs (missing words = 0) for literal map-only probing. Bounded:
    m_bits/64 entries no matter how many values were inserted."""
    n_words = (m_bits + 63) // 64
    dense = [0] * n_words
    for r in bloom.collect():
        dense[r["word"]] = r["bits"]
    return dense


def bloom_might_contain(
    col: Column | str, bitmap: list[int] | Column, m_bits: int, k: int
) -> Column:
    """Map-only membership test against a dense bitmap. True =
    possibly member, False = DEFINITELY not — the prefilter contract.

    ``bitmap`` as a Column should reference a scalar-broadcast array
    (one-row crossJoin) — rows then share ONE cached array. Passing a
    Python list inlines it as a plan literal, which PySpark lowers to
    CreateArray: the array is REBUILT on every evaluation, O(m) per
    probe — only acceptable for tiny bitmaps/tests."""
    c = F.col(col) if isinstance(col, str) else col
    words = bitmap if isinstance(bitmap, Column) else F.lit(bitmap)
    checks = []
    for i in range(k):
        p = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits))
        w = F.element_at(words, (p / 64).cast("int") + 1)
        bit = F.call_function("shiftright", w, (p % 64).cast("int"))
        checks.append(bit.bitwiseAND(F.lit(1).cast("long")) == 1)
    out = checks[0]
    for ch in checks[1:]:
        out = out & ch
    return out


def bloom_member_values(
    values: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Distinct values of ``col`` that are POSSIBLY members, via a
    broadcast join against the bitmap relation — the probe path for
    blooms too big to inline as a plan literal. Shuffles only the
    distinct candidate values (position explode is map-side; the
    bitmap side broadcasts)."""
    v = values.select(F.col(col).alias("_v")).distinct()
    # materialize the position array once per value — referencing
    # bloom_positions twice in one projection would run the k seeded
    # hashes twice (no codegen subexpression reuse for HOF results)
    arr = v.select(
        "_v", bloom_positions("_v", m_bits, k).alias("_arr")
    )
    pos = arr.select(
        "_v",
        F.explode("_arr").alias("_pos"),
        F.size("_arr").alias("_need"),
    )
    joined = pos.join(
        F.broadcast(bloom),
        (F.col("_pos") / 64).cast("long") == F.col("word"),
        "left",
    ).withColumn(
        "_set",
        F.coalesce(
            F.call_function(
                "shiftright", F.col("bits"), (F.col("_pos") % 64).cast("int")
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1,
            F.lit(False),
        ),
    )
    return (
        joined.groupBy("_v", "_need")
        .agg(F.sum(F.col("_set").cast("int")).alias("_nset"))
        .where(F.col("_nset") == F.col("_need"))
        .select(F.col("_v").alias(col))
    )
