"""Sketch operators: error bounds against exact answers, and the
mergeability contract (rollup-then-merge == direct sketch)."""

import pytest
from pyspark.sql import functions as F

from openoa_spark.datapipe import sketches


@pytest.fixture(scope="module")
def events(spark):
    # 20k rows, 1.2k distinct users, skewed event types
    return spark.range(20_000).select(
        (F.col("id") % 1200).alias("user_id"),
        (F.col("id") % 7).alias("day"),
        F.when(F.col("id") % 10 < 6, "view")
        .when(F.col("id") % 10 < 9, "click")
        .otherwise("purchase")
        .alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"),
    )


def test_approx_distinct_within_rsd(events):
    got = sketches.approx_distinct(events, "user_id", rsd=0.02).first()[0]
    assert got == pytest.approx(1200, rel=0.06)  # 3x rsd


def test_approx_quantiles_rank_error(events):
    qs = sketches.approx_quantiles(
        events, "value", [0.1, 0.5, 0.9], accuracy=10_000
    ).first()["quantiles"]
    # value is uniform over 0..99
    assert qs[0] == pytest.approx(10, abs=2)
    assert qs[1] == pytest.approx(50, abs=2)
    assert qs[2] == pytest.approx(90, abs=2)
    assert list(qs) == sorted(qs)


def test_hll_rollup_merges_to_direct_estimate(events):
    daily = sketches.hll_rollup(events, "user_id", ["day"])
    assert daily.count() == 7
    # merging the 7 daily sketches must equal sketching the whole
    # table directly — bit-identical estimates, not just close
    merged = sketches.hll_merge(daily).first()
    direct = (
        sketches.hll_merge(sketches.hll_rollup(events, "user_id", []))
        .first()
    )
    assert merged["distinct_estimate"] == direct["distinct_estimate"]
    assert merged["n_rows"] == 20_000
    # and the estimate is within HLL error of the true 1200
    assert merged["distinct_estimate"] == pytest.approx(1200, rel=0.05)


def test_hll_partial_merge_grain(events):
    daily = sketches.hll_rollup(
        events, "user_id", ["day", "event_type"]
    )
    by_type = sketches.hll_merge(daily, ["event_type"])
    rows = {r["event_type"]: r for r in by_type.collect()}
    assert set(rows) == {"view", "click", "purchase"}
    # view events hit ids with id%10 in 0..5; since 1200 % 10 == 0
    # that reaches exactly 60% of users = 720 distinct
    assert rows["view"]["distinct_estimate"] == pytest.approx(720, rel=0.05)
    assert sum(r["n_rows"] for r in rows.values()) == 20_000


def test_frequent_items_finds_heavy_hitters(events):
    items = sketches.frequent_items(events, "event_type", 0.2).first()[0]
    assert "view" in items and "click" in items


@pytest.fixture(scope="module")
def member_values(spark):
    # 2k member strings; probes will use 2k members + 20k non-members
    return spark.range(2_000).selectExpr("concat('member-', id) AS v")


def test_bloom_no_false_negatives(spark, member_values):
    m, k = 1 << 16, 5
    bloom = sketches.bloom_build(member_values, "v", m, k)
    bitmap = sketches.bloom_collect(bloom, m)
    n_maybe = (
        member_values.where(
            sketches.bloom_might_contain("v", bitmap, m, k)
        ).count()
    )
    assert n_maybe == 2_000  # every member must test positive


def test_bloom_fpr_within_bound(spark, member_values):
    m, k = 1 << 16, 5
    bloom = sketches.bloom_build(member_values, "v", m, k)
    bitmap = sketches.bloom_collect(bloom, m)
    non = spark.range(20_000).selectExpr("concat('other-', id) AS v")
    fp = non.where(sketches.bloom_might_contain("v", bitmap, m, k)).count()
    # theoretical FPR (1 - e^{-kn/m})^k ~ 0.3% at n=2k, m=64k, k=5;
    # allow 3x slack for hash clustering
    assert fp / 20_000 < 0.01


def test_bloom_merge_equals_union_build(spark, member_values):
    m, k = 1 << 16, 5
    half_a = member_values.where("id < 1000")
    half_b = member_values.where("id >= 1000")
    merged = sketches.bloom_merge(
        sketches.bloom_build(half_a, "v", m, k),
        sketches.bloom_build(half_b, "v", m, k),
    )
    direct = sketches.bloom_build(member_values, "v", m, k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_join_probe_matches_literal_probe(spark, member_values):
    m, k = 1 << 16, 5
    bloom = sketches.bloom_build(member_values, "v", m, k)
    bitmap = sketches.bloom_collect(bloom, m)
    probes = spark.range(4_000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN concat('member-', id) "
        "ELSE concat('other-', id) END AS v"
    )
    lit_set = {
        r["v"]
        for r in probes.where(
            sketches.bloom_might_contain("v", bitmap, m, k)
        ).collect()
    }
    join_set = {
        r["v"]
        for r in sketches.bloom_member_values(
            probes, "v", bloom, m, k
        ).collect()
    }
    assert lit_set == join_set
