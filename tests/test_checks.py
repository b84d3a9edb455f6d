"""Unit tests for the declarative data-quality check runner."""

import pytest
from pyspark.sql import functions as F

from openoa_spark.operators.checks import Rule, run_checks


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0, "x@y.com"),
            (2, "b", -1.0, "nope"),
            (2, None, 50.0, None),
            (3, "z", None, "u@v.org"),
        ],
        "id long, cat string, val double, email string",
    )


def test_all_kinds_one_pass(dirty):
    rows = {
        r["rule"]: r
        for r in run_checks(
            dirty,
            [
                Rule("cat_not_null", "not_null", "cat"),
                Rule("id_unique", "unique", "id"),
                Rule("cat_in_set", "in_set", "cat", {"values": ["a", "b"]}),
                Rule("val_in_range", "in_range", "val", {"lo": 0, "hi": 10}),
                Rule("email_ok", "matches", "email",
                     {"pattern": r"^[^@]+@[^@]+\.[a-z]+$"}),
                Rule("val_pos", "custom", "val",
                     {"predicate": F.col("val") > 0}),
            ],
        ).collect()
    }
    assert all(r["total"] == 4 for r in rows.values())
    assert rows["cat_not_null"]["violations"] == 1
    assert rows["id_unique"]["violations"] == 1  # id=2 twice
    assert rows["cat_in_set"]["violations"] == 2  # 'z' + NULL
    assert rows["val_in_range"]["violations"] == 3  # -1.0, 50.0, NULL
    assert rows["email_ok"]["violations"] == 2  # 'nope' + NULL
    assert rows["val_pos"]["violations"] == 2  # -1.0 + NULL predicate
    assert not any(r["pass"] for r in rows.values())


def test_clean_passes(dirty):
    clean = dirty.where(F.col("id") == 1)
    rows = run_checks(
        clean,
        [
            Rule("id_unique", "unique", "id"),
            Rule("cat_not_null", "not_null", "cat"),
        ],
    ).collect()
    assert all(r["pass"] and r["violations"] == 0 for r in rows)


def test_single_job(dirty, capsys):
    # all rules compile into one aggregate: the plan has exactly one
    # scan of the input (no per-rule jobs)
    df = run_checks(
        dirty,
        [
            Rule("a", "not_null", "cat"),
            Rule("b", "in_range", "val", {"lo": 0, "hi": 10}),
            Rule("u", "unique", "id"),
        ],
    )
    df.explain("formatted")
    plan = capsys.readouterr().out
    # numbered operator list: exactly one scan node (the detail
    # section repeats each node, so count tree entries only)
    import re

    assert len(re.findall(r"^\(\d+\) Scan", plan, re.M)) == 1


def test_bad_inputs(dirty):
    with pytest.raises(ValueError):
        run_checks(dirty, [])
    with pytest.raises(ValueError):
        run_checks(
            dirty, [Rule("x", "not_null", "cat"), Rule("x", "unique", "id")]
        )
    with pytest.raises(ValueError):
        run_checks(dirty, [Rule("x", "nope", "cat")]).collect()


def test_hostile_rule_names(dirty):
    # rule names never enter a SQL string or identifier: quotes,
    # spaces, dots, hyphens, and parens all pass through as data
    names = [
        "has space", "has-hyphen", "has.dot", "has'quote",
        'has"dquote', "weird)(",
    ]
    rows = run_checks(
        dirty, [Rule(n, "not_null", "cat") for n in names]
    ).collect()
    assert sorted(r["rule"] for r in rows) == sorted(names)
    assert len({r["violations"] for r in rows}) == 1


def test_table_diff_statuses(spark):
    from openoa_spark.operators import qa as qa_ops

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (4, None, "z")],
        ["id", "v", "w"],
    )
    new = spark.createDataFrame(
        [(2, "b", "x"), (3, "CHANGED", "y"), (4, None, "z"), (5, "e", "q")],
        ["id", "v", "w"],
    )
    out = {
        r["id"]: r["status"]
        for r in qa_ops.table_diff(old, new, ["id"]).collect()
    }
    assert out == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged",
        5: "added",
    }


def test_table_diff_null_vs_empty_not_confused(spark):
    # (NULL, 'a') must differ from ('', 'a') and from ('a', NULL)
    from openoa_spark.operators import qa as qa_ops

    old = spark.createDataFrame([(1, None, "a"), (2, "a", None)], ["id", "v", "w"])
    new = spark.createDataFrame([(1, "", "a"), (2, None, "a")], ["id", "v", "w"])
    out = {
        r["id"]: r["status"]
        for r in qa_ops.table_diff(old, new, ["id"]).collect()
    }
    assert out == {1: "changed", 2: "changed"}
