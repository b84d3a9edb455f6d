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


def test_fast_sums_matches_exact_mode(spark):
    """Deploy (plain-double) aggregation must agree with the
    oracle-pinned decimal-exact mode to float precision on the
    flagship aggregate query — the guarantee that lets bench measure
    fast mode while every correctness surface runs exact."""
    from openoa_spark import registry
    from openoa_spark.functions import stats

    sf = "/root/testdata/sf0.001"
    exact = {
        (r[0], r[1]): r
        for r in registry.q1_pricing_summary(spark, sf).collect()
    }
    with stats.fast_sums():
        fast_df = registry.q1_pricing_summary(spark, sf)
    fast = {(r[0], r[1]): r for r in fast_df.collect()}
    assert set(exact) == set(fast)
    for k in exact:
        for ours, theirs in zip(fast[k], exact[k]):
            if isinstance(theirs, float):
                assert abs(float(ours) - theirs) <= 1e-9 + 1e-9 * abs(theirs), k
            else:
                assert ours == theirs, k
