"""salted_join must be result-identical to the plain join while
spreading a hot key across shuffle partitions."""

import pytest
from pyspark.sql import functions as F

from openoa_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of the large side is one hot key
    large = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)], ["k", "name"]
    )
    return large, small


def test_salted_inner_matches_plain(skewed):
    large, small = skewed
    plain = large.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(large, small, "k", n_salt=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_keeps_unmatched(skewed):
    large, small = skewed
    only_large = large.withColumn("k", F.col("k") + 1000)  # no dim rows
    out = salted_join(only_large, small, "k", how="left")
    assert out.count() == only_large.count()
    assert out.where(F.col("name").isNotNull()).count() == 0


def test_salt_spreads_hot_key(skewed):
    large, _ = skewed
    salts = (
        large.where(F.col("k") == 1)
        .withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(8))
        )
        .select("_salt").distinct().count()
    )
    assert salts == 8  # the hot key occupies all salt sub-keys
