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


# ---------------------------------------------------------------- interval_join

from datetime import datetime

from openoa_spark.operators.joins import interval_join


@pytest.fixture(scope="module")
def points_intervals(spark):
    ts = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    points = spark.createDataFrame(
        [(i, ts(h, m)) for i, (h, m) in enumerate(
            [(0, 30), (1, 15), (2, 45), (5, 0), (8, 59), (9, 1), (23, 30)]
        )],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (100, ts(0, 0), ts(2, 0)),     # catches pids 0, 1
            (200, ts(2, 45), ts(2, 45)),   # zero-length, catches pid 2 exactly
            (300, ts(8, 0), ts(10, 0)),    # catches pids 4, 5
            (400, ts(12, 0), ts(13, 0)),   # catches nothing
        ],
        ["iid", "s", "e"],
    )
    return points, intervals


def _naive(points, intervals):
    return points.join(
        intervals, points["ts"].between(intervals["s"], intervals["e"])
    ).select("pid", "iid")


def test_interval_join_matches_naive(points_intervals):
    points, intervals = points_intervals
    got = sorted(
        map(tuple, interval_join(points, intervals, "ts", "s", "e",
                                 bucket_seconds=3600).select("pid", "iid").collect())
    )
    want = sorted(map(tuple, _naive(points, intervals).collect()))
    assert got == want == [(0, 100), (1, 100), (2, 200), (4, 300), (5, 300)]


def test_interval_join_bucket_size_invariant(points_intervals):
    # result must not depend on the bucket granularity
    points, intervals = points_intervals
    want = sorted(map(tuple, _naive(points, intervals).collect()))
    for bucket in (60.0, 900.0, 7200.0, 86400.0):
        got = sorted(
            map(tuple, interval_join(points, intervals, "ts", "s", "e",
                                     bucket_seconds=bucket)
                .select("pid", "iid").collect())
        )
        assert got == want, f"bucket_seconds={bucket}"


def test_interval_join_no_duplicate_pairs(points_intervals):
    # a point inside an interval spanning many buckets matches ONCE
    points, intervals = points_intervals
    out = interval_join(points, intervals, "ts", "s", "e", bucket_seconds=60.0)
    pairs = [tuple(r) for r in out.select("pid", "iid").collect()]
    assert len(pairs) == len(set(pairs))


def test_interval_join_keys_restrict_matches(spark):
    ts = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    points = spark.createDataFrame(
        [(1, "u1", ts(1)), (2, "u2", ts(1))], ["pid", "user", "ts"]
    )
    intervals = spark.createDataFrame(
        [("u1", 10, ts(0), ts(2))], ["user", "iid", "s", "e"]
    )
    out = interval_join(points, intervals, "ts", "s", "e",
                        bucket_seconds=3600, keys=["user"])
    assert [tuple(r) for r in out.select("pid", "iid").collect()] == [(1, 10)]


def test_interval_join_no_cartesian_in_plan(points_intervals):
    points, intervals = points_intervals
    plan = interval_join(
        points, intervals, "ts", "s", "e", bucket_seconds=3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
