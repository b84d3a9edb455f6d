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
