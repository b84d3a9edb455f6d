"""Hostile-input sweep for the text/dedup family (round 11, verdict
task 4).

The NULL-text SimHash divergence (r8) and the empty-doc sliding-chunk
bug (r5) were both found by code review, not by the oracle gate — the
driver's synthetic corpus is too polite to exercise degenerate inputs.
This tool builds a deterministic HOSTILE documents table (NULLs, empty
and whitespace-only strings, 4-byte UTF-8/emoji, zero-width joiners,
combining marks, control characters, RTL text, 1-char and 1M-char
docs, pathological repetition) in a probe-layout dir whose other
tables symlink sf0.001, then drives tools/check_correctness.py over
every registry query whose oracle touches `documents` — so each
text/dedup operator is cross-engine-verified on exactly the inputs
most likely to split Spark and DuckDB (UTF-8 length semantics, regex
engines, split-on-empty behavior, NULL propagation).

Isolated UTF-16 surrogates are deliberately OUT of contract: parquet
strings are UTF-8 and neither engine can round-trip a lone surrogate
through an Arrow string column (pyarrow refuses to encode), so no
stored corpus can contain one — the ingestion layer (JSONL reader
quarantine) is where such bytes are rejected.

Usage: python tools/hostile_corpus.py [artifact_path]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.001"
PROBE = os.path.abspath("spark-warehouse/hostile_corpus")


def hostile_rows() -> list[tuple]:
    """(doc_id, text, lang, source, n_chars) rows, deterministic.

    n_chars is len(text) in Python code points (the generator's own
    convention for the driver corpus); NULL text gets NULL n_chars.
    """
    emoji = "👩‍👩‍👧‍👦🇺🇳🏴󠁧󠁢󠁳󠁣󠁴󠁿"  # ZWJ family, flag pairs, tag sequences
    texts: list[str | None] = [
        None,                                  # NULL text
        "",                                    # empty
        " ",                                   # single space
        "\t\n  \r\n  ",              # whitespace zoo incl NBSP/thin
        "a",                                   # 1-char doc
        "é",                                   # combining-free accented
        "é",                              # combining acute (NFD)
        emoji,                                 # 4-byte UTF-8 + ZWJ clusters
        "word " * 7 + emoji,                   # mixed ascii/emoji
        "​‌‍",                  # zero-width sp/non-joiner/joiner
        "﻿BOM prefixed doc",              # BOM
        "�� replacement chars",      # U+FFFD
        "נקודה עברית ascii mix שלום",          # RTL + spaces
        "العربية text with ِّ marks",           # Arabic + combining
        "control\x01\x02\x03chars\x1f here",   # C0 controls
        "nul\x00embedded",                      # embedded NUL
        "ABC" * 33_334,    # 100k-char doc: quadratic ORACLE twins
        #   (substr per position) make 1M-char docs a twin-side DNF;
        #   the engine n-gram path is linear since r9
        "the " * 25_000,                        # 100k chars, one token repeated
        "x",                                    # duplicate of a 1-char? no: distinct
        "a b",                                  # minimal 2-token
        "  leading and trailing  ",
        "Tab\tseparated\ttokens",
        "line\nbreaks\nonly\nhere",
        "UPPER lower MiXeD 123 456.789 !?",
        "ひらがな カタカナ 漢字テキスト",          # CJK no-space script
        "中文没有空格的长句子测试一下分词行为",      # Chinese, no spaces
        "ASCII only plain sentence with period.",
        "ASCII only plain sentence with period.",  # exact duplicate pair
        "punct !!! ??? ;;; ::: ... ---",
        "123 456 789 0 numbers only",
        "mixed nbsp ls ps separators",
        "🎉" * 1000,                            # emoji-only long doc
        "́̂̃",                   # ISOLATED combining marks
        "ǅǈǲ titlecase digraphs ǆǉǳ",
        "ß sharp s and İ dotted I casefold traps",
    ]
    rows = []
    for i, t in enumerate(texts):
        lang = ["en", "he", "ar", "ja", "zh", None][i % 6]
        source = ["web", "books", None][i % 3]
        rows.append(
            (i, t, lang, source, None if t is None else len(t))
        )
    return rows


def build_probe() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(PROBE, "_DONE")):
        print(f"probe dir {PROBE} exists, reusing")
        return
    os.makedirs(PROBE, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(PROBE, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    rows = hostile_rows()
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(PROBE, "documents.parquet"))
    open(os.path.join(PROBE, "_DONE"), "w").write(str(len(rows)))
    print(f"hostile corpus: {len(rows)} docs at {PROBE}")


def doc_family_queries() -> list[str]:
    """Every registry query whose oracle SQL (or rows-only Spark body)
    reads the documents table."""
    from openoa_spark import registry

    names = []
    oracles = registry.oracle_sql()
    for name in registry.queries():
        sql = oracles.get(name, "")
        if re.search(r"\bdocuments\b", sql) or name.endswith("_docs"):
            names.append(name)
    return names


def main() -> None:
    artifact = sys.argv[1] if len(sys.argv) > 1 else "HOSTILE_r11.txt"
    build_probe()
    names = doc_family_queries()
    print(f"{len(names)} doc-family queries")
    done = set()
    if os.path.exists(artifact):
        for line in open(artifact):
            m = re.match(r"(PASS|ROWS)\s+(\w+):", line)
            if m:
                done.add(m.group(2))
    todo = [n for n in names if n not in done]
    print(f"{len(done)} already green, {len(todo)} to run")
    # one process is fine at 35 docs; 1800 s is generous
    for i in range(0, len(todo), 6):
        chunk = todo[i : i + 6]
        try:
            p = subprocess.run(
                [sys.executable, "tools/check_correctness.py", PROBE, *chunk],
                capture_output=True,
                text=True,
                timeout=1800,
                env={**os.environ, "SPARK_GRAFT_PROGRESS": "0"},
            )
            out = p.stdout + "\n" + p.stderr
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode()
                   if isinstance(e.stdout, bytes) else (e.stdout or ""))
            out += "\n[CHUNK TIMEOUT]\n" 
        lines = [
            ln
            for ln in out.splitlines()
            if re.match(r"(PASS|FAIL|ROWS)\s+\w+:", ln)
        ]
        with open(artifact, "a") as f:
            f.write(f"== batch: {' '.join(chunk)}\n")
            for ln in lines:
                f.write(ln.rstrip() + "\n")
                print(ln.rstrip())
        seen = {
            m.group(2)
            for ln in lines
            if (m := re.match(r"(PASS|FAIL|ROWS)\s+(\w+):", ln))
        }
        missing = [n for n in chunk if n not in seen]
        if missing:
            with open(artifact, "a") as f:
                f.write(f"== NO RESULT (crash?): {missing}\n")
            print("NO RESULT:", missing)


if __name__ == "__main__":
    main()
