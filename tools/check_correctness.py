"""Local stand-in for the driver's t2 correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over
the same sf dir, then compares row count, column names, and values
(order-insensitive, with a small float tolerance so we can distinguish
"semantics wrong" from "last-ulp noise").

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def compare(spark_rows, duck_rows, cols) -> str | None:
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"

    def key(row):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(round(v, 6))
            else:
                out.append(v)
        return tuple(str(x) for x in out)

    # STRICT: the driver's gate hashes round-6 values, so any round-6
    # string difference is a real failure. (A relative-tolerance
    # fallback here masked the round-1 q1 hash failure — don't re-add.)
    s_sorted = sorted(map(key, spark_rows))
    d_sorted = sorted(map(key, duck_rows))
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            diffs = []
            for x, y in zip(a, b):
                if x != y:
                    try:
                        diffs.append(f"|Δ|={abs(float(x) - float(y)):.3g}")
                    except ValueError:
                        diffs.append("non-float")
            return f"value mismatch at sorted row {i}: {a} vs {b} ({', '.join(diffs)})"
    return None


def main():
    import duckdb

    from openoa_spark import registry
    from openoa_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import os

    spark = get_session("check-correctness")
    con = duckdb.connect()
    # resource caps so a pathological twin plan DNFs loudly instead of
    # filling the disk (the r10 sf1.3 asof twin wrote 230 GB of temp
    # under DuckDB's defaults)
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='spark-warehouse/duck_tmp'")
    con.execute("SET max_temp_directory_size='60GB'")
    for name in registry.queries():
        con.execute(
            f"CREATE OR REPLACE VIEW _all_{name} AS SELECT 1"
        )  # no-op; views below
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        src = (
            f"read_parquet('{p}/*.parquet')" if os.path.isdir(p)
            else f"read_parquet('{p}')"
        )
        if t == "events":
            # Branch on the ACTUAL parquet ts column type, exactly as
            # registry._t does — not on directory layout (r10 ADVICE:
            # a dir-layout dataset with a real TIMESTAMP ts must not
            # get the int64-nanos rewrite, and vice versa).
            ts_type = {
                r[0]: str(r[1])
                for r in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()
            }.get("ts", "")
            if ts_type == "BIGINT":
                # raw int64 nanos (scale-probe layout) -> micros
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM {src}"
                )
            elif ts_type == "TIMESTAMP_NS":
                # nanos timestamp (rounds 1-2 driver layout) -> us,
                # truncating like Spark's nanosAsLong + ts DIV 1000
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * REPLACE "
                    f"(CAST(ts AS TIMESTAMP) AS ts) FROM {src}"
                )
            else:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}"
                )
        else:
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")

    qs = registry.queries()
    oracles = registry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    # Above-gate-scale campaigns can inflate pair-listing queries past
    # what a driver collect can hold (simhash_near_dups: 283M rows at
    # 13x — the near-identical probe copies form cliques). For all-
    # integral results past this threshold, compare engine-side
    # checksums instead: COUNT + per-column exact decimal SUMs + one
    # column-binding mixed sum — order-insensitive, value-sensitive,
    # zero driver collect on either engine. Opt-in (campaign runs set
    # it): the path costs an extra count() execution per all-integral
    # query, which routine sf0.001 sweeps shouldn't pay.
    checksum_threshold = int(
        os.environ.get("SPARK_GRAFT_CHECKSUM_ROWS", "0")
    )

    def spark_checksums(sdf, int_cols):
        from pyspark.sql import functions as F

        mixed = None
        for i, c in enumerate(int_cols):
            term = F.col(c).cast("decimal(38,0)") * F.lit(
                1_000_003 ** (i % 3)
            ).cast("decimal(38,0)")
            mixed = term if mixed is None else mixed + term
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs += [
            F.sum(F.col(c).cast("decimal(38,0)")).alias(f"_s_{c}")
            for c in int_cols
        ]
        aggs.append(F.sum(mixed).alias("_mix"))
        row = sdf.agg(*aggs).first()
        return tuple(str(v) for v in row)

    def duck_checksums(sql, int_cols):
        sums = ", ".join(
            f"CAST(CAST(SUM(CAST({c} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
            f" AS VARCHAR) AS _s_{c}"
            for c in int_cols
        )
        mixed = " + ".join(
            f"CAST({c} AS DECIMAL(38,0)) * {1_000_003 ** (i % 3)}"
            for i, c in enumerate(int_cols)
        )
        q = (
            f"SELECT COUNT(*) AS _n, {sums}, "
            f"CAST(CAST(SUM({mixed}) AS DECIMAL(38,0)) AS VARCHAR) AS _mix "
            f"FROM ({sql}) AS _chk"
        )
        row = con.execute(q).fetchone()
        return tuple(str(v) for v in row)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            int_types = {"int", "bigint", "smallint", "tinyint"}
            all_int = all(t in int_types for _, t in sdf.dtypes)
            if checksum_threshold and all_int and name in oracles:
                n_rows = sdf.count()
                if n_rows > checksum_threshold:
                    s_chk = spark_checksums(sdf, cols)
                    d_chk = duck_checksums(oracles[name], cols)
                    if s_chk == d_chk:
                        print(
                            f"PASS  {name}: checksum ({n_rows} rows, "
                            f"count+sums+mix equal) [{time.time()-t0:.1f}s]"
                        )
                        n_pass += 1
                    else:
                        print(
                            f"FAIL  {name}: checksum mismatch "
                            f"{s_chk} vs {d_chk}"
                        )
                        n_fail += 1
                    continue
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            # Output-type lint first: the driver fetches via Arrow/
            # pandas, where HUGEINT coerces to float64 and hash-
            # mismatches Spark's bigint even when values agree (the
            # round-3 48/50 regression). fetchall() below cannot see
            # that, so reject the type up front.
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) AS _q LIMIT 0")
            banned = {
                c: str(t)
                for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")
            }
            if banned:
                print(
                    f"FAIL  {name}: oracle emits HUGEINT (driver Arrow "
                    f"fetch renders float64): {banned} — CAST(... AS BIGINT)"
                )
                n_fail += 1
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(cols) != sorted(duck_cols):
            print(f"FAIL  {name}: columns {sorted(cols)} vs {sorted(duck_cols)}")
            n_fail += 1
            continue
        # align column order by name
        duck_idx = [duck_cols.index(c) for c in cols]
        duck_rows = [tuple(r[i] for i in duck_idx) for r in duck_rows]
        err = compare(spark_rows, duck_rows, cols)
        if err:
            print(f"FAIL  {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
