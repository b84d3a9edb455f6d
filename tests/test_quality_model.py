"""Model-based quality filtering: train on silver labels from a
synthetic corpus with a planted quality split, verify the classifier
separates the two populations and that scoring is a distributed
map-only transform."""

import random

import pytest
from pyspark.sql import functions as F

from openoa_spark.datapipe import quality_model as qm


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    stop = ["the", "and", "for", "with", "that", "this", "from", "have"]
    body = ["model", "data", "wind", "power", "turbine", "energy",
            "signal", "filter", "sample", "vector"]
    rows = []
    for i in range(200):
        # high quality: long, stopword-rich, varied
        n = rng.randint(80, 140)
        words = [rng.choice(stop if j % 3 == 0 else body) for j in range(n)]
        rows.append((i, " ".join(words), 1))
    for i in range(200, 400):
        kind = i % 3
        if kind == 0:  # too short
            t = " ".join(rng.choice(body) for _ in range(rng.randint(2, 6)))
        elif kind == 1:  # repetitive spam
            t = " ".join(["buy", "now"] * rng.randint(30, 60))
        else:  # punctuation soup
            t = " ".join(
                "".join(rng.choice("!@#$%^&*()[]{}") for _ in range(5))
                for _ in range(rng.randint(20, 40))
            )
        rows.append((i, t, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, truth int")


def test_featurize_is_null_safe(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "plain text here")],
        "doc_id long, text string",
    )
    feats = qm.featurize(df).collect()
    for r in feats:
        for c in qm.FEATURE_COLS:
            assert r[c] is not None


def test_classifier_separates_planted_quality(corpus):
    feats = qm.featurize(corpus)
    labeled = qm.silver_labels(feats)
    train, test = labeled.randomSplit([0.8, 0.2], seed=11)
    model = qm.fit_quality_classifier(train)
    scored = qm.score_documents(test, model)
    # grade against the PLANTED truth, not the silver labels the model
    # trained on — passing requires the silver heuristic + model to
    # recover the underlying split
    agg = scored.agg(
        F.avg(
            (F.col("quality_pred") == F.col("truth")).cast("double")
        ).alias("acc")
    ).first()
    assert agg["acc"] >= 0.9, f"accuracy {agg['acc']}"


def test_score_documents_featurizes_raw_corpus(corpus):
    labeled = qm.silver_labels(qm.featurize(corpus))
    model = qm.fit_quality_classifier(labeled)
    raw = corpus.select("doc_id", "text")
    scored = qm.score_documents(raw, model)
    assert scored.count() == corpus.count()
    cols = set(scored.columns)
    assert {"quality_prob", "quality_pred"} <= cols
    # internal/feature columns dropped by default
    assert not cols & set(qm.FEATURE_COLS)
    assert "probability" not in cols
    probs = scored.select("quality_prob").limit(5).collect()
    for r in probs:
        assert 0.0 <= r["quality_prob"] <= 1.0


def test_scoring_plan_stays_jvm_side(corpus):
    """The apply path must be a map-only transform: no Python row
    UDFs (BatchEvalPython) in the scoring plan."""
    labeled = qm.silver_labels(qm.featurize(corpus))
    model = qm.fit_quality_classifier(labeled)
    plan = (
        qm.score_documents(corpus.select("doc_id", "text"), model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan


def test_scoring_applies_to_a_stream(spark, corpus, tmp_path):
    """The apply path is a map-only transform, so a fitted model must
    score a readStream directly (the streaming-curation deployment
    shape) and agree with the batch scores."""
    import uuid

    labeled = qm.silver_labels(qm.featurize(corpus))
    model = qm.fit_quality_classifier(labeled)
    src = str(tmp_path / "docs_in")
    corpus.select("doc_id", "text").write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    scored = qm.score_documents(stream, model)
    assert scored.isStreaming
    name = f"qm_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: (r["quality_prob"], r["quality_pred"])
        for r in spark.table(name).collect()
    }
    want = {
        r["doc_id"]: (r["quality_prob"], r["quality_pred"])
        for r in qm.score_documents(
            corpus.select("doc_id", "text"), model
        ).collect()
    }
    assert got == want


def test_silver_labels_blank_and_null_are_low_quality(spark):
    """Empty/whitespace/NULL docs must label 0.0 WITHOUT tripping the
    ANSI divide-by-zero in the ratio signals, and must not be
    null-skipped into label 1.0 by least/greatest semantics."""
    # every bigram contains a unique w_i token, so repetition ~ 0
    rng_text = " ".join(
        f"the w{3*i} and w{3*i+1} for w{3*i+2}" for i in range(20)
    )
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, rng_text)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["label"] for r in qm.silver_labels(df).collect()}
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
    assert got[4] == 1.0
