"""Multi-file scan-layout probe (round 11, verdict task 5).

Every per-query perf conclusion so far rests on the driver testdata's
ONE-parquet-file-per-table layout plus ``session.spread_small_input``
(the shim that repartitions a small scan so expression-heavy map
pipelines don't run on one core — a no-op at production partition
counts). A real deployment reads tables split across many files, so
scans start parallel and AQE coalescing replaces the shim. This probe
answers: does any headline plan DEGRADE when the shim's work is done
by the layout instead?

Build: each sf0.1 table rewritten as ``n_files`` parquet files
(values identical, schema identical — Spark round-trips the micros
timestamps and doubles losslessly). Measure: the 19 bench.py headline
queries, engine and DuckDB twin, interleaved median-of-3 in ONE
process at BOTH layouts (same-process pairing per SCALING.md
"Round-9 bench-noise root cause").

Usage: python tools/layout_probe.py [n_files] [query ...]
Prints one JSON line; writes nothing outside spark-warehouse/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openoa_spark import registry  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402
from tools.sf1_bench import TABLES, _duck_connection, measure  # noqa: E402

BASE = "/root/testdata/sf0.1"
PROBE = os.path.abspath("spark-warehouse/layout_probe")


def build_layout(spark, n_files: int) -> None:
    marker = os.path.join(PROBE, "_DONE")
    if os.path.exists(marker) and open(marker).read() == str(n_files):
        print(f"layout dir {PROBE} exists ({n_files} files/table), reusing")
        return
    t0 = time.time()
    for t in TABLES:
        src = os.path.join(BASE, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        (
            spark.read.parquet(src)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(os.path.join(PROBE, f"{t}.parquet"))
        )
    with open(marker, "w") as f:
        f.write(str(n_files))
    print(f"layout built in {time.time() - t0:.0f}s")


def main() -> None:
    from bench import BENCH_QUERIES

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    queries = sys.argv[2:] or BENCH_QUERIES
    spark = get_session("layout-probe")
    build_layout(spark, n_files)
    osql = registry.oracle_sql()

    out = {"metric": "layout_probe", "n_files": n_files,
           "base": "sf0.1", "reps": 3, "queries": queries}
    for tag, sf_dir in (("single_file", BASE), (f"{n_files}_files", PROBE)):
        con = _duck_connection(sf_dir)
        times, otimes = measure(spark, con, sf_dir, osql, queries)
        con.close()
        out[tag] = {
            "engine": times,
            "twin": otimes,
            "ratio": {
                n: (round(times[n] / otimes[n], 3) if otimes.get(n) else None)
                for n in queries
            },
        }
    single = out["single_file"]["engine"]
    multi = out[f"{n_files}_files"]["engine"]
    out["engine_multi_over_single"] = {
        n: round(multi[n] / single[n], 3) for n in queries if single.get(n)
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
