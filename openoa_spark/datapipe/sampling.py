"""Deterministic, cluster-stable sampling and sharding operators.

Spark's ``df.sample()`` draws per-partition from a seeded RNG, so its
output is stable only for a FIXED partitioning: a repartition, an AQE
coalesce, or a different input split silently changes which rows are
kept. For a 100-TB training-data pipeline you want *content-derived*
sampling: hash a key column, keep rows whose hash falls below
``fraction`` of the hash space. Membership is then a pure function of
the row — reproducible across runs, engines, executors and cluster
sizes, stable under incremental re-runs, and trivially auditable (the
oracle can replay it bit-exactly).

No OpenOA counterpart — training-data pipeline extension. Same idiom
as Hive's ``TABLESAMPLE (BUCKET x OUT OF y ON col)`` and the
hash-mod-bucket sampling used by web-scale corpus pipelines.

Everything here is a pure Column expression over
:func:`openoa_spark.datapipe.dedup.hash64` — JVM-side, codegen'd, no
shuffle for the filter itself (``hash_shard`` adds one shuffle only if
the caller repartitions by the shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openoa_spark.datapipe.dedup import hash64, sql_hash64

# md5 mode of hash64 yields a value uniform on [0, 2^60).
M60 = 1 << 60


def _key(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def hash_threshold(fraction: float) -> int:
    """Integer hash-space threshold for ``fraction`` (md5-60-bit mode).

    Computed driver-side as an exact int so Spark and the DuckDB
    oracle compare against the identical literal instead of each
    rounding ``fraction * 2^60`` separately.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * M60)


def hash_sample(
    df: DataFrame,
    key_col: Column | str,
    fraction: float,
    seed: int = 0,
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep rows whose content hash lands in the first ``fraction`` of
    the hash space. Deterministic: a row's membership never changes,
    regardless of partitioning, cluster size, or engine.

    ``hash_fn='md5'`` (default) is oracle-replayable; ``'xxhash64'``
    is the cheaper production hash (signed 64-bit, mapped to the same
    [0, 2^60) range by positive modulus).
    """
    h = hash64(_key(key_col), seed=seed, hash_fn=hash_fn)
    if hash_fn == "xxhash64":
        # fold the signed 64-bit value into [0, 2^60); pmod keeps
        # Long.MIN_VALUE (abs-overflow) and negatives non-negative
        h = F.pmod(h, F.lit(M60))
    return df.where(h < F.lit(hash_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: Column | str,
    strata_col: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-stratum deterministic sampling (``df.sampleBy`` made
    reproducible): each stratum value gets its own keep-fraction.

    The threshold is a single CASE expression — no per-stratum scan,
    no shuffle, one codegen'd filter over the fact table.
    """
    s = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thr: Column = F.lit(hash_threshold(default_fraction))
    for value, frac in fractions.items():
        thr = F.when(s == value, F.lit(hash_threshold(frac))).otherwise(thr)
    h = hash64(_key(key_col), seed=seed, hash_fn=hash_fn)
    if hash_fn == "xxhash64":
        h = F.pmod(h, F.lit(M60))
    return df.where(h < thr)


def hash_shard(
    key_col: Column | str,
    num_shards: int,
    seed: int = 0,
    hash_fn: str = "md5",
) -> Column:
    """Deterministic shard id in [0, num_shards) for balanced output
    sharding (e.g. writing training shards): a pure function of the
    key, so re-runs and backfills land rows in the same shard.
    Partition the write by this column (`.repartition(num_shards,
    shard).write.partitionBy(shard)`) for one shuffle total.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = hash64(_key(key_col), seed=seed, hash_fn=hash_fn)
    if hash_fn == "xxhash64":
        h = F.pmod(h, F.lit(M60))
    return (h % F.lit(num_shards)).cast("int")


def weighted_hash_sample(
    df: DataFrame,
    key_col: Column | str,
    weight_col: Column | str,
    base_fraction: float,
    ref_weight: float,
    seed: int = 0,
    hash_fn: str = "md5",
) -> DataFrame:
    """Deterministic weighted (Poisson) sampling: row inclusion
    probability = min(1, base_fraction * weight / ref_weight), decided
    by a content hash — the weighted analogue of :func:`hash_sample`
    (e.g. keep long documents proportionally more often when building
    a char-budgeted subcorpus).

    Cross-engine determinism: the per-row threshold is
    ``floor(c * weight)`` with ``c = base_fraction * 2^60 /
    ref_weight`` computed ONCE driver-side; both engines evaluate the
    identical double multiply + floor (IEEE-deterministic), and the
    hash comparison stays in integer space — no double rendering of
    the 60-bit hash (exact only to 2^53).
    """
    if base_fraction < 0 or ref_weight <= 0:
        raise ValueError("need base_fraction >= 0 and ref_weight > 0")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    c = base_fraction * M60 / ref_weight
    thr = F.floor(F.lit(c) * w.cast("double")).cast("long")
    h = hash64(_key(key_col), seed=seed, hash_fn=hash_fn)
    if hash_fn == "xxhash64":
        h = F.pmod(h, F.lit(M60))
    return df.where(h < thr)


# Canonical 3-way split breakpoints; cumulative fractions.
DEFAULT_SPLITS = (("train", 0.8), ("val", 0.9), ("test", 1.0))


def _validate_splits(splits) -> None:
    if abs(splits[-1][1] - 1.0) > 1e-12:
        raise ValueError("last cumulative fraction must be 1.0")
    prev = 0.0
    for label, cum in splits:
        if not prev < cum <= 1.0:
            raise ValueError(
                "cumulative fractions must be strictly increasing in "
                f"(0, 1]; got {cum} after {prev} at {label!r}"
            )
        prev = cum


def hash_split(
    key_col: Column | str,
    splits=DEFAULT_SPLITS,
    seed: int = 0,
    hash_fn: str = "md5",
) -> Column:
    """Deterministic dataset-split label (train/val/test) from a
    content hash: a row's split never changes across runs, engines, or
    partitionings — the property that makes retraining comparable and
    prevents test-set leakage when the corpus is rebuilt.

    ``splits``: ordered (label, cumulative_fraction) pairs; fractions
    must be strictly increasing within (0, 1] and end at 1.0 — a
    non-monotonic list would silently yield empty/oversized splits in
    a function whose whole point is leakage-proof assignment.
    """
    _validate_splits(splits)
    h = hash64(_key(key_col), seed=seed, hash_fn=hash_fn)
    if hash_fn == "xxhash64":
        h = F.pmod(h, F.lit(M60))
    # build right-to-left so the FIRST (smallest) matching threshold wins
    out = F.lit(splits[-1][0])
    for label, cum in reversed(splits[:-1]):
        out = F.when(h < F.lit(hash_threshold(cum)), F.lit(label)).otherwise(out)
    return out


# ------------------------------------------------------------------ SQL twins

def sql_hash_sample_pred(key_expr: str, fraction: float, seed: int = 0) -> str:
    """DuckDB predicate replaying ``hash_sample(..., hash_fn='md5')``."""
    return f"{sql_hash64(key_expr, seed)} < {hash_threshold(fraction)}"


def sql_weighted_sample_pred(
    key_expr: str,
    weight_expr: str,
    base_fraction: float,
    ref_weight: float,
    seed: int = 0,
) -> str:
    """DuckDB predicate replaying ``weighted_hash_sample`` (md5)."""
    c = base_fraction * M60 / ref_weight
    return (
        f"{sql_hash64(key_expr, seed)} < "
        f"CAST(FLOOR({c!r} * CAST(({weight_expr}) AS DOUBLE)) AS BIGINT)"
    )


def sql_hash_split(key_expr: str, splits=DEFAULT_SPLITS, seed: int = 0) -> str:
    """DuckDB expression replaying ``hash_split`` (md5)."""
    _validate_splits(splits)
    h = sql_hash64(key_expr, seed)
    cases = " ".join(
        f"WHEN {h} < {hash_threshold(cum)} THEN '{label}'"
        for label, cum in splits[:-1]
    )
    return f"(CASE {cases} ELSE '{splits[-1][0]}' END)"


def sql_hash_shard(key_expr: str, num_shards: int, seed: int = 0) -> str:
    """DuckDB expression replaying ``hash_shard(..., hash_fn='md5')``."""
    return f"CAST({sql_hash64(key_expr, seed)} % {num_shards} AS INTEGER)"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: Column | str,
    block_tokens: int,
    num_shards: int = 8,
    seed: int = 0,
    hash_fn: str = "md5",
) -> DataFrame:
    """Sequence-packing manifest for fixed-length training blocks
    ("concat then chunk"): documents are deterministically sharded,
    laid head-to-tail within each shard in id order, and chunked into
    ``block_tokens``-sized blocks. Returns, per document:
    ``(id, shard, n_tokens, start_offset, block_id, block_offset)`` —
    the manifest a tokenizer/writer stage consumes to emit packed
    training examples without ever materializing the concatenation.

    Scale shape: ONE window cumsum per shard (pure integer arithmetic,
    bit-identical on any engine/partitioning). The hash shard bounds
    each window partition at corpus_size / num_shards and packing is
    embarrassingly parallel across shards; raise ``num_shards`` with
    corpus size — block boundaries never cross shards.
    """
    from pyspark.sql import Window

    n = (F.col(n_tokens_col) if isinstance(n_tokens_col, str)
         else n_tokens_col)
    out = df.select(
        F.col(id_col),
        hash_shard(id_col, num_shards, seed, hash_fn).alias("shard"),
        n.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
    )
    return out.select(
        id_col, "shard", "n_tokens", "start_offset",
        F.floor(F.col("start_offset") / block_tokens).alias("block_id"),
        (F.col("start_offset") % block_tokens).alias("block_offset"),
    )


def temperature_sampling_weights(
    df: DataFrame, group_col: str, alpha: float = 0.7
) -> DataFrame:
    """Temperature-based resampling weights per group (the multilingual
    training-mix correction: target fraction ∝ natural_fraction^alpha,
    alpha<1 up-weights low-resource groups). Returns per group:
    ``(group, n_docs, natural_frac, target_frac, weight)`` where
    ``weight`` is the per-row sampling multiplier a downstream
    hash-sampler or repeat-factor stage applies.

    Shape: one count aggregate (group cardinality is O(languages) —
    tiny), then two one-row scalar broadcasts for the total and the
    normalizer. The fact table is scanned once; everything after is
    arithmetic on a dimension-sized frame. Fractions are rounded to 6
    digits (libm pow may differ in the last ulp across engines).
    """
    # the counts table is dimension-sized but its lineage contains the
    # full corpus scan; cut it once so the scan executes once (the
    # lazy plan otherwise rescans for the total, the normalizer, and
    # the final projection — 4 corpus scans, tools/plan_audit.py)
    c = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).localCheckpoint(eager=False)
    t = c.agg(F.sum("n_docs").alias("_total"))
    p = (
        c.join(F.broadcast(t))
        .withColumn("_nat", F.col("n_docs") / F.col("_total"))
        .withColumn("_un", F.pow("_nat", F.lit(alpha)))
    )
    z = p.agg(F.sum("_un").alias("_z"))
    return p.join(F.broadcast(z)).select(
        group_col,
        "n_docs",
        F.round("_nat", 6).alias("natural_frac"),
        F.round(F.col("_un") / F.col("_z"), 6).alias("target_frac"),
        F.round((F.col("_un") / F.col("_z")) / F.col("_nat"), 6).alias(
            "weight"
        ),
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Select documents in (``tokens_col`` DESC, ``id_col`` ASC)
    priority order until the cumulative token budget is exhausted: a
    document is kept iff the tokens accumulated BEFORE it are under
    ``budget`` (so the budget boundary document is included). This is
    the "build a fixed-token-count training mix from the best
    documents" primitive.

    Scale shape: a naive ``Window.orderBy(...)`` cumulative sum pulls
    the whole corpus through ONE task. Instead the running total
    decomposes per distinct token-count value (the zipf-rank offset
    pattern, registry zipf_slope): cum(id) = offset(v) + v * rank of
    the doc within its token-count group, where offset(v) = total
    tokens of all strictly-higher groups. The offset table is bounded
    by |distinct token counts| — orders of magnitude below the corpus
    (the only keyless window runs over it).

    The within-group rank is itself skew-safe (round 5): a single
    token-count value can be a MEGA-group (every max-length-truncated
    document shares the cap), and a window partition cannot be split
    by AQE — so ranking goes through
    :func:`openoa_spark.functions.stats.keyed_row_number` (fixed
    global id-range sub-buckets + per-(group, bucket) count-prefix
    offsets; ids are corpus-uniform, so every group splits ~evenly).
    Output: (id, n_tokens, cum_tokens) for the selected set.
    """
    from pyspark.sql import Window

    from openoa_spark.functions.stats import keyed_row_number

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens").isNotNull())
    base = base.localCheckpoint(eager=False)
    grp = base.groupBy("n_tokens").agg(F.sum("n_tokens").alias("_gtot"))
    w_off = Window.orderBy(F.desc("n_tokens")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = grp.select(
        "n_tokens",
        F.coalesce(F.sum("_gtot").over(w_off), F.lit(0)).alias("_off"),
    )
    ranked = keyed_row_number(base, ["n_tokens"], "_id", "_rank")
    out = (
        ranked.join(F.broadcast(off), "n_tokens")
        .select(
            F.col("_id"),
            "n_tokens",
            (
                F.col("_off") + F.col("n_tokens") * F.col("_rank")
            ).alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.lit(budget))
    )
    return out.select(F.col("_id").alias(id_col), "n_tokens", "cum_tokens")


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    splits=DEFAULT_SPLITS,
    seed: int = 0,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.4,
    hash_fn: str = "md5",
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate-aware train/val/test assignment: the split key
    is the document's near-dup CLUSTER representative (MinHash-LSH
    pairs -> connected components -> min id), not the document itself
    — so two near-identical documents can never straddle train and
    test. A plain per-document hash split (:func:`hash_split`)
    permits exactly that leakage: a paraphrased copy of a training
    document lands in test with probability test_fraction, silently
    inflating eval scores.

    Scale shape: the LSH/CC machinery is the same bucketed design as
    near_dedup (banded equi-join with optional skew cap, pointer-
    doubling CC); the final assignment is one left join of the
    corpus against the (paired docs only) component table plus a
    map-only hash expression — unpaired documents (the vast majority)
    take their own id as representative and never shuffle.

    Output: ``df`` + ``split_rep`` (the cluster representative the
    hash keyed on) + ``split``.
    """
    from openoa_spark.datapipe.dedup import (
        connected_components,
        minhash_near_dup_pairs,
    )

    pairs = minhash_near_dup_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_n,
        jaccard_threshold, hash_fn, max_band_bucket,
    )
    comp = connected_components(pairs).withColumnRenamed("doc_id", "_cc_id")
    joined = df.join(
        comp, df[id_col] == F.col("_cc_id"), "left"
    ).drop("_cc_id")
    rep = F.coalesce(F.col("component"), F.col(id_col))
    return (
        joined.withColumn("split_rep", rep)
        .withColumn(
            "split",
            # same hash_fn for BOTH stages: a caller matching an
            # existing xxhash64-keyed split pipeline must not silently
            # get md5 split labels (review r6)
            hash_split(
                F.col("split_rep").cast("string"), splits, seed,
                hash_fn=hash_fn,
            ),
        )
        .drop("component")
    )
