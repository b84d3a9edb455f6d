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
