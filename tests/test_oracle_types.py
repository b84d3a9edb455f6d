"""Oracle output-type lint: make the local gate see what the driver sees.

Round-3 post-mortem: the driver's correctness harness fetches DuckDB
results via Arrow/pandas, where HUGEINT (DuckDB's type for SUM over
integers) coerces to float64 — so an oracle emitting HUGEINT hashes
``61234.0`` against Spark's bigint ``61234`` and fails even though the
values agree. ``fetchall()`` (the local checker's old path) converts
HUGEINT to Python int and cannot see the failure, which is how two red
gate rows shipped in round 3 (VERDICT.md "What's wrong" #1/#2).

This lint closes the *class*, not just the five instances:

1. No oracle may emit HUGEINT/UHUGEINT — wrap integer SUMs in
   ``CAST(... AS BIGINT)``.
2. Every oracle column's type bucket (int/float/decimal/str/bool/
   date/timestamp/...) must match the Spark query's output bucket, so
   a DECIMAL-typed oracle column vs a Spark double (or vice versa) is
   caught before the driver's hash does.

The type probe is ``SELECT * FROM (<sql>) LIMIT 0`` — DuckDB resolves
output types without executing the query, so the duck-side sweep is
fast.  The Spark side only needs ``.schema`` (plan analysis, no jobs)
except for the handful of queries that collect bin-grain intermediates
while *building* the plan, which sf0.001 keeps cheap.
"""

from __future__ import annotations

import duckdb
import pytest

from openoa_spark import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BANNED = {"HUGEINT", "UHUGEINT"}


def _duck_bucket(t: str) -> str:
    t = t.upper()
    if t in BANNED:
        return "banned"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "int"
    if t in {"FLOAT", "REAL", "DOUBLE"}:
        return "float"
    if t in {"VARCHAR", "STRING", "TEXT"}:
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "struct"
    if t.endswith("[]") or t.startswith("LIST"):
        return "array"
    return t.lower()


def _spark_bucket(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in {"tinyint", "smallint", "int", "bigint", "byte", "short",
             "integer", "long"}:
        return "int"
    if t in {"float", "double"}:
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("struct") or t.startswith("map"):
        return "struct"
    if t.startswith("array"):
        return "array"
    return t


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracle_types(con, sql: str) -> dict[str, str]:
    rel = con.sql(f"SELECT * FROM ({sql}) AS _lint_q LIMIT 0")
    return dict(zip(rel.columns, (str(t) for t in rel.types)))


def test_no_hugeint_oracle_columns(duck):
    """The exact round-3 regression class: any HUGEINT output column
    will hash-mismatch through the driver's Arrow/pandas fetch."""
    bad = {}
    for name, sql in registry.oracle_sql().items():
        types = _oracle_types(duck, sql)
        banned = {c: t for c, t in types.items()
                  if _duck_bucket(t) == "banned"}
        if banned:
            bad[name] = banned
    assert not bad, (
        "oracles emitting HUGEINT/UHUGEINT (wrap the integer SUM in "
        f"CAST(... AS BIGINT)): {bad}"
    )


def test_no_list_or_struct_oracle_columns(duck):
    """Round-5 regression class: the driver's canonicalizer does a
    pandas ``sort_values`` over every output column and cannot hash
    LIST/STRUCT values (``embedding_int8_quantization`` shipped red
    with ``unhashable type: 'list'``). Nested outputs must be emitted
    scalar — ``array_to_string``/``concat_ws`` in the oracle and
    ``F.array_join`` on the Spark side — or exploded to rows."""
    bad = {}
    for name, sql in registry.oracle_sql().items():
        types = _oracle_types(duck, sql)
        nested = {c: t for c, t in types.items()
                  if _duck_bucket(t) in {"array", "struct"}}
        if nested:
            bad[name] = nested
    assert not bad, (
        "oracles emitting LIST/STRUCT columns (flatten with "
        f"array_to_string / explode to rows): {bad}"
    )


def test_oracle_spark_type_buckets_agree(duck, spark):
    """Column-by-column type-bucket parity between each oracle and its
    Spark twin — catches DECIMAL-vs-DOUBLE (and int-vs-float) output
    mismatches that survive fetchall() but not the driver's hash."""
    oracles = registry.oracle_sql()
    qs = registry.queries()
    mismatches = {}
    for name, sql in oracles.items():
        duck_types = _oracle_types(duck, sql)
        sdf = qs[name](spark, SF_DIR)
        spark_types = dict(sdf.dtypes)
        assert sorted(duck_types) == sorted(spark_types), (
            f"{name}: column names differ: "
            f"{sorted(duck_types)} vs {sorted(spark_types)}"
        )
        diff = {
            c: (duck_types[c], spark_types[c])
            for c in duck_types
            if _duck_bucket(duck_types[c]) != _spark_bucket(spark_types[c])
        }
        if diff:
            mismatches[name] = diff
    assert not mismatches, f"oracle/Spark output-type mismatches: {mismatches}"


def test_no_direct_decimal_double_casts_in_oracles():
    """DuckDB's direct CAST(DECIMAL AS DOUBLE) divides the scaled
    int128 by 10^scale in double space — up to one ulp off the
    correctly-rounded double once |value|·10^scale exceeds 2^53
    (found at 13x bench SF on q1's scale-6 sum_charge; Spark's
    BigDecimal cast rounds correctly). Oracle twins must route
    decimal sums to double through VARCHAR (strtod is correctly
    rounded at any magnitude): stats.sql_cast_double / sql_dsum /
    sql_davg. This lint scans every oracle for ANY cast whose body
    both mentions DECIMAL and lands on DOUBLE without routing through
    VARCHAR — not just the literal CAST(SUM( prefix (r10 ADVICE: a
    CAST(AVG(...DECIMAL...) AS DOUBLE), CAST(MAX(..., or whitespace
    between CAST and the paren must not slip through)."""
    import re

    from openoa_spark import registry

    offenders = []
    for name, sql in registry.oracle_sql().items():
        for m0 in re.finditer(r"CAST\s*\(", sql):
            k = m0.end()
            depth, m = 1, k
            while depth > 0 and m < len(sql):
                if sql[m] == "(":
                    depth += 1
                elif sql[m] == ")":
                    depth -= 1
                m += 1
            inner = sql[k:m - 1]
            if (re.search(r"AS\s+DOUBLE\s*$", inner.rstrip())
                    and "DECIMAL" in inner.upper()
                    and not re.search(r"AS\s+VARCHAR", inner)):
                offenders.append(f"{name}: …{inner[:70]}…")
    assert not offenders, (
        "direct decimal→double cast in oracle SQL (use "
        f"stats.sql_cast_double — one-ulp hazard past 2^53): {offenders}"
    )
