"""Tests for deterministic hash sampling / sharding / decontamination."""

from pyspark.sql import functions as F

from openoa_spark.datapipe import sampling, text


def _docs(spark, n=400):
    rows = [(i, "en" if i % 3 else "de") for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_hash_sample_fraction_and_determinism(spark):
    df = _docs(spark)
    out1 = sampling.hash_sample(df, "doc_id", 0.25, seed=1)
    out2 = sampling.hash_sample(df.repartition(7), "doc_id", 0.25, seed=1)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    # membership is content-derived: identical under any partitioning
    assert ids1 == ids2
    # fraction approximately honored (binomial tolerance)
    assert 0.15 * 400 < len(ids1) < 0.35 * 400


def test_hash_sample_monotone_in_fraction(spark):
    # sample(0.1) ⊆ sample(0.3): thresholds nest, so samples nest —
    # the property that makes incremental scale-up reproducible
    df = _docs(spark)
    small = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.1, seed=5).collect()}
    big = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.3, seed=5).collect()}
    assert small <= big


def test_hash_sample_xxhash_backend(spark):
    df = _docs(spark)
    out = sampling.hash_sample(df, "doc_id", 0.25, seed=1, hash_fn="xxhash64")
    n = out.count()
    assert 0.1 * 400 < n < 0.4 * 400
    # deterministic across partitionings too
    n2 = sampling.hash_sample(
        df.repartition(5), "doc_id", 0.25, seed=1, hash_fn="xxhash64"
    ).count()
    assert n == n2


def test_stratified_hash_sample(spark):
    df = _docs(spark, 600)
    out = sampling.stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.05}, seed=2
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_en, n_de = 400, 200
    assert 0.35 * n_en < counts.get("en", 0) < 0.65 * n_en
    assert counts.get("de", 0) < 0.2 * n_de
    # default fraction 0: unlisted strata drop entirely
    df2 = df.withColumn("lang", F.lit("fr"))
    assert sampling.stratified_hash_sample(
        df2, "doc_id", "lang", {"en": 0.5}, seed=2
    ).count() == 0


def test_hash_shard_balanced_and_stable(spark):
    df = _docs(spark, 800)
    out = df.withColumn("shard", sampling.hash_shard("doc_id", 8, seed=3))
    counts = [r["n"] for r in
              out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(counts) == 8
    assert max(counts) < 2.0 * min(counts)  # roughly balanced
    # stable: same key → same shard on a reshuffled input
    a = {r["doc_id"]: r["shard"] for r in out.collect()}
    b = {r["doc_id"]: r["shard"]
         for r in df.repartition(3)
         .withColumn("shard", sampling.hash_shard("doc_id", 8, seed=3))
         .collect()}
    assert a == b


def test_benchmark_overlap_planted_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # doc 1 copies a benchmark span -> contaminated trigrams
            (1, "alpha beta gamma delta unrelated tail words here"),
            # doc 2 shares no trigram with the benchmark
            (2, "totally different words with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           text.benchmark_overlap(corpus, bench, "text", "doc_id", n=3).collect()}
    # doc1: 6 distinct trigrams, 2 of them benchmark spans
    assert out[1]["n_grams"] == 6
    assert out[1]["n_hit"] == 2
    assert abs(out[1]["contamination"] - 2 / 6) < 1e-6
    assert out[2]["n_hit"] == 0
    assert out[2]["contamination"] == 0.0


def test_hash_threshold_bounds():
    import pytest

    assert sampling.hash_threshold(0.0) == 0
    assert sampling.hash_threshold(1.0) == sampling.M60
    with pytest.raises(ValueError):
        sampling.hash_threshold(1.5)
    with pytest.raises(ValueError):
        sampling.hash_shard("k", 0)


def test_pack_sequences_manifest_invariants(spark):
    from pyspark.sql import functions as F

    from openoa_spark.datapipe import sampling

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("int").alias("n_tokens"),
    )
    out = sampling.pack_sequences(
        df, "doc_id", "n_tokens", block_tokens=16, num_shards=4
    ).collect()
    assert len(out) == 100
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        # offsets are contiguous head-to-tail within each shard
        assert r["start_offset"] == by_shard.get(r["shard"], 0)
        by_shard[r["shard"]] = r["start_offset"] + r["n_tokens"]
        # block coordinates are consistent with the running offset
        assert r["block_id"] == r["start_offset"] // 16
        assert r["block_offset"] == r["start_offset"] % 16
        assert 0 <= r["block_offset"] < 16


def test_temperature_sampling_weights(spark):
    from openoa_spark.datapipe import sampling

    df = spark.createDataFrame(
        [("en",)] * 90 + [("sw",)] * 10, ["lang"]
    )
    rows = {r["lang"]: r for r in
            sampling.temperature_sampling_weights(df, "lang", 0.7).collect()}
    # alpha<1 up-weights the low-resource language, down-weights the big one
    assert rows["sw"]["weight"] > 1.0 > rows["en"]["weight"]
    assert abs(rows["en"]["natural_frac"] - 0.9) < 1e-6
    total = rows["en"]["target_frac"] + rows["sw"]["target_frac"]
    assert abs(total - 1.0) < 1e-5


def test_weighted_hash_sample_proportional(spark):
    from openoa_spark.datapipe import sampling

    df = spark.createDataFrame(
        [(i, 100 if i % 2 == 0 else 2000) for i in range(4000)],
        ["id", "w"],
    )
    out = sampling.weighted_hash_sample(
        df, "id", "w", base_fraction=0.2, ref_weight=1000.0, seed=3
    )
    rows = out.groupBy("w").count().collect()
    by_w = {r["w"]: r["count"] for r in rows}
    # inclusion prob: 0.02 for w=100, 0.4 for w=2000 (2000 rows each)
    assert 15 <= by_w.get(100, 0) <= 70
    assert 700 <= by_w[2000] <= 900
    # deterministic: same call -> same membership
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(
        r["id"]
        for r in sampling.weighted_hash_sample(
            df.repartition(7), "id", "w", 0.2, 1000.0, seed=3
        ).collect()
    )
    assert ids1 == ids2
    # xxhash production backend also runs
    n_xx = sampling.weighted_hash_sample(
        df, "id", "w", 0.2, 1000.0, seed=3, hash_fn="xxhash64"
    ).count()
    assert 700 <= n_xx <= 1000


def test_hash_split_partition_and_stability(spark):
    from openoa_spark.datapipe import sampling

    df = spark.createDataFrame([(i,) for i in range(5000)], ["id"])
    out = df.withColumn("split", sampling.hash_split("id", seed=13))
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # a row's split is a pure function of the key: stable under
    # repartitioning and incremental extension
    sub = df.where("id < 1000").withColumn(
        "split", sampling.hash_split("id", seed=13)
    )
    full = {r["id"]: r["split"] for r in out.where("id < 1000").collect()}
    assert {r["id"]: r["split"] for r in sub.collect()} == full
    with __import__("pytest").raises(ValueError):
        sampling.hash_split("id", splits=(("a", 0.5), ("b", 0.9)))


def test_hash_split_rejects_non_monotonic():
    import pytest

    from openoa_spark.datapipe import sampling

    with pytest.raises(ValueError, match="strictly increasing"):
        sampling.hash_split("id", splits=(("a", 0.9), ("b", 0.8), ("c", 1.0)))
    with pytest.raises(ValueError, match="strictly increasing"):
        sampling.sql_hash_split("id", splits=(("a", 0.0), ("b", 1.0)))


def test_token_budget_select_mega_group(spark):
    """Truncation-cap shape: 80% of documents share ONE token count
    (every max-length doc), the within-group rank mega-group the
    round-5 id-range sub-bucket decomposition exists for. Selection
    and cumulative sums must still match the serial oracle exactly,
    and the plan's rank window must be keyed by (group, bucket)."""
    from openoa_spark.datapipe import sampling

    rows = [(i, 512) for i in range(4000)] + [
        (10_000 + i, 100 + (i % 37)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    budget = 900_000
    out = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in sampling.token_budget_select(
            df, "doc_id", "n_tokens", budget
        ).collect()
    }
    # serial oracle: priority order (tokens desc, id asc), keep while
    # the running total BEFORE the doc is under budget
    cum, want = 0, {}
    for i, n in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum < budget:
            want[i] = (n, cum + n)
        cum += n
    assert out == want
    plan = sampling.token_budget_select(
        df, "doc_id", "n_tokens", budget
    )._jdf.queryExecution().executedPlan().toString()
    assert "_rnb" in plan  # the sub-bucketed rank window is in the plan
