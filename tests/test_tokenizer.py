"""BPE merge learning / segmentation (datapipe.tokenizer)."""

import pytest

from openoa_spark.datapipe import tokenizer


def _py_bpe(texts, n_merges):
    """Pure-python reference: word-internal greedy BPE, max count,
    lexicographically smallest pair on ties."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[w] += 1
    vs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, syms in vs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        if not pc:
            break
        mx = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == mx)[0]
        merges.append((rank, a, b, mx))
        for w, syms in vs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vs[w] = out
    return merges, vs


def test_bpe_learn_matches_python_reference(spark):
    texts = [
        "low low low lower lowest newer newer new",
        "wider wide new newer lowest low",
        "a ab abc abcd",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = tokenizer.bpe_learn_merges(df, "text", n_merges=8)
    want, _ = _py_bpe(texts, 8)
    assert got == want


def test_bpe_learn_randomized_vs_reference(spark):
    import random

    rng = random.Random(19)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(60)]
    texts = [" ".join(rng.choice(words) for _ in range(25)) for _ in range(8)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # checkpoint_every=2 exercises the lineage-flattening path
    got = tokenizer.bpe_learn_merges(df, "text", n_merges=6, checkpoint_every=2)
    want, _ = _py_bpe(texts, 6)
    assert got == want


def test_bpe_segment_matches_reference_segmentation(spark):
    texts = ["low lower newest", "newer wide wider low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = tokenizer.bpe_learn_merges(df, "text", n_merges=5)
    _, vs = _py_bpe(texts, 5)
    rows = df.select(
        "doc_id", tokenizer.bpe_segment_tokens("text", merges).alias("toks")
    ).collect()
    for r in rows:
        want = [s for w in texts[r["doc_id"]].lower().split() for s in vs[w]]
        assert list(r["toks"]) == want


def test_bpe_token_count_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, "aa aa aa"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    merges = tokenizer.bpe_learn_merges(df, "text", n_merges=1)
    # the only pair is (a, a) with count 3
    assert merges == [(0, "a", "a", 3)]
    counts = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", tokenizer.bpe_token_count("text", merges).alias("n")
        ).collect()
    }
    assert counts == {0: 3, 1: 0, 2: 0}


def test_bpe_min_count_prunes_tail(spark):
    df = spark.createDataFrame(
        [(0, "zz zz zz zz qx")], "doc_id long, text string"
    )
    # with the hapax pruned, (q, x) can never be selected
    got = tokenizer.bpe_learn_merges(df, "text", n_merges=2, min_count=2)
    assert got == [(0, "z", "z", 4)]


def test_bpe_single_symbol_words_no_crash(spark):
    # fully-merged / single-char words must not hit the descending-
    # sequence pitfall
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    got = tokenizer.bpe_learn_merges(df, "text", n_merges=3)
    assert got == []  # no adjacent pairs exist at all
    assert (
        df.select(tokenizer.bpe_token_count("text", got).alias("n")).first()["n"]
        == 5
    )


def test_bpe_requires_positive_merges(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        tokenizer.bpe_learn_merges(df, "text", n_merges=0)
