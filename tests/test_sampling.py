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
