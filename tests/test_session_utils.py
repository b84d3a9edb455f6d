"""Tests for session-level execution helpers."""

from openoa_spark.session import spread_small_input


def test_spread_small_input_widens_single_partition(spark):
    df = spark.range(0, 1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread_small_input(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # content preserved
    assert out.count() == 1000


def test_spread_small_input_noop_when_already_wide(spark):
    wide = spark.range(0, 1000).repartition(
        spark.sparkContext.defaultParallelism + 4
    )
    out = spread_small_input(wide)
    # no extra exchange: the SAME DataFrame object comes back
    assert out is wide


def test_spread_small_input_explicit_min(spark):
    df = spark.range(0, 100).coalesce(1)
    assert spread_small_input(df, min_partitions=7).rdd.getNumPartitions() == 7
    assert spread_small_input(df, min_partitions=1) is df


def _canon_row(row):
    """Sortable canonical form: floats/Decimals rounded to 6 digits,
    nested arrays tupled, everything stringified for a total order."""
    import decimal

    def c(v):
        if isinstance(v, (float, decimal.Decimal)):
            # round(…, 6) kills near-zero noise (and -0.0); .10g
            # canonicalizes to 10 significant digits so a 3e8-sized
            # double sum whose modes differ at 1e-15 RELATIVE (last
            # ulp of the accumulation order) still compares equal.
            return float(f"{round(float(v), 6) + 0.0:.10g}")
        if isinstance(v, list):
            return tuple(c(x) for x in v)
        return v

    return tuple(str(c(v)) for v in row)


def test_fast_sums_matches_exact_mode_all_bench_queries(spark):
    """Deploy (plain-double) aggregation must agree with the
    oracle-pinned decimal-exact mode on EVERY bench query — the
    guarantee that lets bench measure fast mode while every
    correctness surface runs exact. If the modes ever diverge on a
    query, BENCH would be grading a plan the correctness gate never
    sees. Agreement pinned at round-6 after canonical row sort."""
    import importlib

    from openoa_spark import registry
    from openoa_spark.functions import stats

    bench = importlib.import_module("bench")
    sf = "/root/testdata/sf0.01"
    qs = registry.queries()
    for name in bench.BENCH_QUERIES:
        exact = sorted(_canon_row(r) for r in qs[name](spark, sf).collect())
        with stats.fast_sums():
            fast_df = qs[name](spark, sf)
        fast = sorted(_canon_row(r) for r in fast_df.collect())
        assert fast == exact, name


def test_grouped_exact_median_matches_f_median(spark):
    """The bounded-memory bracket median (stats.grouped_exact_median)
    is bit-identical to F.median across group-size regimes: tiny
    (collect-all path), boundary, and bracket-path groups, with heavy
    duplicates, nulls, and null keys."""
    import random

    from pyspark.sql import functions as F

    from openoa_spark.functions import stats

    random.seed(7)
    rows = []
    for g, n in enumerate([1, 2, 3, 5, 101, 4999, 5001, 12000]):
        for _ in range(n):
            rows.append((
                f"g{g}",
                random.choice(
                    [round(random.uniform(0, 100), 2),
                     float(random.randint(0, 5))]
                ),
            ))
    rows += [("g0", None), (None, 9.0)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    ref = {
        r["k"]: r["m"]
        for r in df.where("k is not null")
        .groupBy("k").agg(F.median("v").alias("m")).collect()
    }
    got = {
        r["k"]: r["med"]
        for r in stats.grouped_exact_median(df, ["k"], "v", "med").collect()
    }
    assert got == ref


def test_grouped_exact_percentile_matches_f_percentile(spark):
    """grouped_exact_percentile replicates F.percentile bitwise —
    including the (1−frac)·lo + frac·hi interpolation — at low,
    median, and high quantiles in both group-size regimes."""
    import random

    from pyspark.sql import functions as F

    from openoa_spark.functions import stats

    random.seed(5)
    rows = []
    for g, n in enumerate([4, 800, 7000, 15000]):
        for _ in range(n):
            rows.append((f"g{g}", round(random.uniform(-10, 10), 3)))
    df = spark.createDataFrame(rows, "k string, v double").repartition(16)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        ref = {
            r["k"]: r["p"]
            for r in df.groupBy("k")
            .agg(F.percentile("v", F.lit(q)).alias("p")).collect()
        }
        got = {
            r["k"]: r["p"]
            for r in stats.grouped_exact_percentile(
                df, ["k"], "v", q, "p"
            ).collect()
        }
        assert got == ref, q
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stats.grouped_exact_percentile(df, ["k"], "v", 1.5)


def test_grouped_top_k_matches_row_number(spark):
    """grouped_top_k (bounded-memory, window-free) equals the
    row_number()-over-partition idiom exactly — including on the two
    adversarial shapes that break value-bracketing alone: an all-equal
    megagroup (winners resolved purely by the tie pass) and a huge tie
    run straddling the k-th seat."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from openoa_spark.functions import stats

    random.seed(9)
    rows = []
    for g, n in enumerate([1, 3, 900, 6000, 12000]):
        for i in range(n):
            rows.append((
                f"g{g}",
                random.choice([float(random.randint(0, 50)),
                               round(random.uniform(0, 100), 1)]),
                g * 1_000_000 + i,
            ))
    rows += [("gconst", 7.5, 9_000_000 + i) for i in range(8000)]
    rows += [("gtie", 99.0, 8_000_000)] + [
        ("gtie", 50.0, 8_000_001 + i) for i in range(7000)
    ]
    df = spark.createDataFrame(rows, "k string, v double, id long").repartition(16)
    for k in (1, 4, 200):
        w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("id"))
        ref = sorted(map(tuple, (
            df.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k).drop("_r").collect()
        )))
        got = sorted(map(tuple, stats.grouped_top_k(df, ["k"], "v", "id", k).collect()))
        assert got == ref, k
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stats.grouped_top_k(df, ["k"], "v", "id", 0)


def test_grouped_exact_median_histogram_matches_f_median(spark):
    """The one-scan histogram strategy (low-cardinality value domains)
    is bit-identical to F.median too — heavy duplicates, even/odd
    group sizes, and a group with a single distinct value."""
    import random

    from pyspark.sql import functions as F

    from openoa_spark.functions import stats

    random.seed(13)
    rows = [("gone", 5.25)] * 40
    for g, n in enumerate([1, 2, 5, 1000, 20000]):
        for _ in range(n):
            rows.append((f"g{g}", round(random.uniform(0, 500), 2)))
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    ref = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(F.median("v").alias("m")).collect()
    }
    got = {
        r["k"]: r["m"]
        for r in stats.grouped_exact_median_histogram(
            df, ["k"], "v", "m"
        ).collect()
    }
    assert got == ref


def test_keyed_row_number_matches_window(spark):
    """keyed_row_number (global-grid sub-buckets, no skewable window)
    equals row_number() over (partition by key order by o) exactly —
    including a 30k-row mega-group."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from openoa_spark.functions import stats

    random.seed(3)
    rows = [("mega", i * 7 + 1) for i in range(30000)]
    for g in range(5):
        vals = random.sample(range(1, 10**9), random.randint(1, 2000))
        rows += [(f"g{g}", v) for v in vals]
    df = spark.createDataFrame(rows, "k string, o long").repartition(16)
    w = Window.partitionBy("k").orderBy("o")
    ref = sorted(map(tuple,
        df.withColumn("rn", F.row_number().over(w)).collect()))
    got = sorted(map(tuple,
        stats.keyed_row_number(df, ["k"], "o", "rn").collect()))
    assert got == ref


def test_grouped_exact_order_stat_matches_sorted_rank(spark):
    """grouped_exact_order_stat returns the element at rank ceil(q*n)
    (percentile_disc / DuckDB quantile_disc semantics) in both
    group-size regimes (whole-group collect and bracket pass), and
    always an actual input value."""
    import math
    import random

    from openoa_spark.functions import stats

    random.seed(11)
    data = {}
    for g, n in enumerate([1, 5, 800, 7000]):
        data[f"g{g}"] = sorted(round(random.uniform(-10, 10), 3) for _ in range(n))
    rows = [(k, v) for k, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, v double").repartition(16)
    for q in (0.1, 1.0 / 3.0, 0.5, 2.0 / 3.0, 0.99, 1.0):
        got = {
            r["k"]: r["p"]
            for r in stats.grouped_exact_order_stat(df, ["k"], "v", q, "p").collect()
        }
        for k, vs in data.items():
            expect = vs[math.ceil(q * len(vs)) - 1]
            assert got[k] == expect, (k, q, got[k], expect)
    # global (keys=[]) path
    allv = sorted(v for vs in data.values() for v in vs)
    r = stats.grouped_exact_order_stat(df, [], "v", 0.5, "p").collect()
    assert len(r) == 1 and r[0]["p"] == allv[math.ceil(0.5 * len(allv)) - 1]


def test_registry_table_cache_invalidation(spark, tmp_path):
    # r12 (ADVICE): _T_CACHE pins the parquet file index captured at
    # first read; a directory mutated mid-session needs an explicit
    # invalidate_tables(sf_dir) to drop the stale handle. Pin the
    # helper's contract: per-dir invalidation removes exactly that
    # dir's entries, re-read observes the rewritten data, and a blank
    # call clears everything.
    from openoa_spark import registry

    d = str(tmp_path)
    spark.range(3).toDF("id").write.parquet(f"{d}/nation.parquet")
    assert registry._t(spark, d, "nation").count() == 3
    # rewrite in place: the memoized handle still sees the old listing
    spark.range(5).toDF("id").write.mode("overwrite").parquet(
        f"{d}/nation.parquet"
    )
    assert registry.invalidate_tables(d) >= 1
    assert registry._t(spark, d, "nation").count() == 5
    assert registry.invalidate_tables(d + "/nonexistent") == 0
    n_before = len(registry._T_CACHE)
    assert registry.invalidate_tables() == n_before
    assert not registry._T_CACHE
