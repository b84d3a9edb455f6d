"""Tokenizer-vocabulary induction over a distributed corpus: BPE
merge learning and segmentation (Sennrich et al. 2016) as vocab-grain
DataFrame passes.

The classic trainer operates on the word->count dictionary, not raw
text — this module keeps that shape distributed: the corpus collapses
ONCE to a (word, n) vocabulary table (one explode + one hash
aggregate, map-side combined), and every BPE iteration is a pass over
VOCAB — bounded by distinct-word count, not corpus size — consisting
of one pair-count aggregate (symbol pairs weighted by word count) and
one map-only merge. The selected merge is a single driver-collected
row re-broadcast as a literal, so no per-row state ever reaches the
driver.

Merges are applied with plain left-to-right non-overlapping string
replacement over a guarded symbol encoding (see _sym_string): both
Spark's ``replace`` and DuckDB's ``replace`` scan left-to-right
consuming matches, which IS greedy BPE merge order, so the
correctness oracle replays merge learning exactly — integer counts
and lexicographic tie-breaks make every selection deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# between-symbol separator and its guarded pair pattern: a symbol
# string is ' s1  s2  s3 ' (single-space guards, double-space
# separators). A pair pattern ' a  b ' can then never match across a
# symbol boundary (symbols contain no spaces, and each match needs
# the full guard on both sides), and consecutive occurrences keep
# their own guards, so one replace() pass = greedy left-to-right
# non-overlapping merge — bit-identical in Spark and DuckDB.
_SEP = "  "


def _words(text_col: Column | str) -> Column:
    from openoa_spark.datapipe.dedup import normalize_text

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(normalize_text(c), " "), lambda w: w != "")


def _sym_string(word: Column) -> Column:
    """Guarded symbol encoding of a word, initial symbols = chars:
    'abc' -> ' a  b  c '."""
    return F.concat(F.lit(" "), F.array_join(F.split(word, ""), _SEP), F.lit(" "))


def _syms(sym_string: Column) -> Column:
    return F.split(F.trim(sym_string), _SEP)


def _merge_expr(sym_string: Column, left: str, right: str) -> Column:
    return F.replace(
        sym_string,
        F.lit(f" {left}{_SEP}{right} "),
        F.lit(f" {left}{right} "),
    )


def word_vocab(df: DataFrame, text_col: str, min_count: int = 1) -> DataFrame:
    """The (word, n) vocabulary table every BPE iteration runs over:
    one explode + ONE map-side-combined hash aggregate collapses the
    corpus to vocab grain. ``min_count`` prunes the hapax tail (the
    standard trainer knob — hapaxes dominate vocab row count but
    cannot win a merge)."""
    w = df.select(F.explode(_words(text_col)).alias("word"))
    v = w.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        v = v.where(F.col("n") >= min_count)
    return v


def bpe_learn_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 1,
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns
    ``[(rank, left, right, pair_count), ...]`` in learned order.

    Per iteration: adjacent symbol pairs of every vocab word, weighted
    by word count, through one hash aggregate; the argmax pair
    (greatest count, ties to lexicographically smallest (left, right))
    is collected — ONE row — and applied as a map-only guarded
    replace. The merge chain deepens the vocab plan by one projection
    per iteration, so every ``checkpoint_every`` merges the vocab
    localCheckpoints to keep lineage flat (the table is vocab-grain —
    cheap to materialize).

    Word-internal merges only (no end-of-word marker) — symmetric to
    text.bpe_ish_token_count's segmentation granularity.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = word_vocab(df, text_col, min_count=min_count).select(
        _sym_string(F.col("word")).alias("s"), "n"
    )
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        syms = _syms(F.col("s"))
        # guard BEFORE sequence: a fully-merged single-symbol word
        # would make sequence(0, -1) DESCEND (the shingles gotcha)
        pairs = vocab.where(F.size(syms) >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(syms) - 2),
                    lambda i: F.struct(
                        F.get(syms, i).alias("left"),
                        F.get(syms, i + 1).alias("right"),
                    ),
                )
            ).alias("p"),
            "n",
        )
        best = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol — nothing to merge
        b = best[0]
        merges.append((rank, b["left"], b["right"], b["c"]))
        vocab = vocab.select(
            _merge_expr(F.col("s"), b["left"], b["right"]).alias("s"), "n"
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_segment_tokens(
    text_col: Column | str, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Array of BPE tokens for a text column under learned merges:
    each word is encoded, the merge chain applied IN RANK ORDER
    (replacement order is part of BPE's definition), and the per-word
    token arrays flattened. Pure column expression — map-only,
    composes with any upstream filter."""
    def seg(w: Column) -> Column:
        s = _sym_string(w)
        for _, left, right, _ in sorted(merges):
            s = _merge_expr(s, left, right)
        return _syms(s)

    return F.flatten(F.transform(_words(text_col), seg))


def bpe_token_count(
    text_col: Column | str, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Token count under a learned BPE vocabulary — the budget metric
    a token-priced pipeline actually pays (whitespace counts
    undercount CJK/agglutinative text; char counts overcount): size of
    bpe_segment_tokens."""
    return F.size(bpe_segment_tokens(text_col, merges))
