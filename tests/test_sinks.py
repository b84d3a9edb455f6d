"""Bucketed/partitioned sinks: the join on co-bucketed tables must be
shuffle-free — that is the entire point of the layout."""

import pytest
from pyspark.sql import functions as F

from openoa_spark.sources import sinks


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(0, 10000).withColumn("v", F.col("id") * 2.0)
    b = spark.range(0, 10000).withColumn("w", F.col("id") % 7)
    sinks.write_bucketed(a, "t_bucket_a", ["id"], 8, sort_cols=["id"],
                         path=str(tmp_path / "a"))
    sinks.write_bucketed(b, "t_bucket_b", ["id"], 8, sort_cols=["id"],
                         path=str(tmp_path / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "id")
        assert joined.count() == 10000
        # inspect the FINAL adaptive plan (post-execution): the
        # sort-merge join must read co-located buckets with no
        # Exchange on either side
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("part", (F.col("id") % 4).cast("int"))
    sinks.write_partitioned(df, str(tmp_path / "p"), ["part"])
    back = spark.read.parquet(str(tmp_path / "p")).where(F.col("part") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan or "part#" in plan
    assert back.count() == 250
