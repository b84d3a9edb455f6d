"""sf1 paired bench leg (round 10): settle the r9 job-floor claim
with data.

Three bench queries hold >2x their per-query DuckDB twins at sf0.1
(lm_score_docs 4.1x, chunk_dedup_docs 2.5x, bin_filter_lineitem 4.4x)
while the engine beats its twin wherever real work dominates. The r9
plan-shape audit exhausted the search (eight shapes measured) and
attributed the residue to Spark's constant per-job scheduling floor —
a claim about SCALE, so it must be measured at scale: if the floor
explanation is right, the per-query ratios drop toward (or below) 2x
at 13x the data, because the floor amortizes while both engines' real
work grows linearly.

Protocol (identical to bench.py, which r9 validated across a 2x
host-load swing): engine and twin interleaved per repetition, median
of 3, both sides warmed first, same process for BOTH scale points —
cross-session ratios are invalid (SCALING.md "Round-9 bench-noise
root cause"). The engine runs deploy-mode plans (fast_sums), the twin
runs the registry oracle SQL, exactly like the driver bench.

Probe data: tools/scale_probe.build_probe_dir inflates sf0.1 by
``factor`` (default 13 — lineitem ~7.8M rows ~ TPC-H sf1.3, docs 65k,
events span 390 days). The DuckDB views glob the Spark-written
parquet directories and re-derive the events timestamp from the raw
int64-nanos layout the probe writes (registry._t branches on it; the
twin needs the same branch).

Usage: python tools/sf1_bench.py [factor] [query ...]
(prints one JSON line; default query set below)

Measurement caveat found on the first full run: twins whose sf1.3
footprint is tens of GB (asof_hourly_value spills >60 GB and DNFs;
user_daily_correlation_pairs runs ~99 s) trash the page cache and
allocator state for every measurement AFTER them in the same
process — engine times for the small queries inflated ~2x vs a
clean process. Measure the floor-claim trio in a process WITHOUT
the monster twins (pass the names), and report the full-set run
separately as the worst-case-contention datapoint.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openoa_spark import registry  # noqa: E402
from openoa_spark.functions import stats  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402
from tools.scale_probe import build_probe_dir  # noqa: E402

# the three >2x queries + controls the engine WINS at sf0.1, so the
# measurement can separate "floor amortizes" from "everything merely
# got slower/faster together"
QUERIES = [
    "lm_score_docs",
    "chunk_dedup_docs",
    "bin_filter_lineitem",
    "minhash_near_dups",
    "asof_hourly_value",
    "user_daily_correlation_pairs",
]

REPS = 3
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # a twin that needs more resources than this at 13x data is a DNF
    # measurement, not a license to fill the disk: the first sf1.3 run
    # died writing >200 GB of DuckDB temp spill during the
    # asof_hourly_value twin warm (its range-join intermediate; under
    # these caps it DNFs at the 60 GB temp ceiling instead)
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='spark-warehouse/duck_tmp'")
    con.execute("SET max_temp_directory_size='60GB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) \
            else f"read_parquet('{p}')"
        # schema probe, not a data row: DESCRIBE works on an empty
        # events table where `SELECT typeof(ts) ... LIMIT 1` returned
        # no row and crashed on fetchone() (r11 ADVICE)
        if t == "events" and os.path.isdir(p) and (
            dict(
                (r[0], r[1])
                for r in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()
            ).get("ts") == "BIGINT"
        ):
            # sf1_bench probe layout: ts is raw int64 NANOs (see
            # build_probe_dir). Branch on the READ dtype, not on
            # directory-ness — the r11 layout probe's multi-file dirs
            # round-trip through Spark and keep plain TIMESTAMP micros
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM {src}"
            )
        else:
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")
    return con


def measure(spark, con, sf_dir: str, osql, queries) -> tuple[dict, dict]:
    qs = registry.queries()
    times: dict[str, float] = {}
    otimes: dict[str, float] = {}
    dnf: set[str] = set()
    with stats.fast_sums():
        for name in queries:  # warm both sides at THIS sf
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            try:
                con.execute(osql[name]).fetchall()
            except Exception as e:  # noqa: BLE001 — twin DNF is data
                dnf.add(name)
                print(f"# {sf_dir}: {name} twin DNF under resource "
                      f"caps: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
        for name in queries:
            ets, ots = [], []
            for _ in range(REPS):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ets.append(time.perf_counter() - t0)
                if name in dnf:
                    continue
                t0 = time.perf_counter()
                con.execute(osql[name]).fetchall()
                ots.append(time.perf_counter() - t0)
            times[name] = round(statistics.median(ets), 4)
            otimes[name] = round(statistics.median(ots), 4) if ots else None
            print(f"# {sf_dir}: {name} engine {times[name]} "
                  f"twin {otimes[name]}", file=sys.stderr, flush=True)
    return times, otimes


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    queries = sys.argv[2:] or QUERIES
    base = "/root/testdata/sf0.1"
    spark = get_session("sf1-bench")
    d = os.path.join("spark-warehouse", "sf1_bench")
    t0 = time.perf_counter()
    # SF1_REUSE=1: trust an existing probe dir from an earlier run of
    # the SAME factor (r12 — a 48x build takes minutes; rebuilding it
    # after an OOM'd measurement leg wastes the build)
    if not (os.environ.get("SF1_REUSE") == "1" and os.path.isdir(d)):
        build_probe_dir(spark, base, factor, d)
    build_s = round(time.perf_counter() - t0, 2)
    osql = registry.oracle_sql()

    out = {"metric": "sf1_paired_bench", "factor": factor,
           "base": "sf0.1", "build_s": build_s, "reps": REPS,
           "queries": queries}
    for tag, sf_dir in (("sf0.1", base), (f"sf{0.1 * factor:g}", d)):
        con = _duck_connection(sf_dir)
        times, otimes = measure(spark, con, sf_dir, osql, queries)
        con.close()
        out[tag] = {
            "engine": times,
            "twin": otimes,
            "ratio": {
                n: (round(times[n] / otimes[n], 3)
                    if otimes.get(n) else None)
                for n in queries
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
