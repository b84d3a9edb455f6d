"""Interleaved A/B timer for one registry query inside ONE session.

The round-9 bench-noise finding (SCALING.md): cross-session timing
pairs are meaningless under host-level contention, so any A/B claim
must interleave both variants in one process. This harness flips an
env var (read by the code under test) between reps:

    python tools/ab_query.py <query> <ENV_VAR> <N reps> [sf_dir]

emits one JSON line with per-variant medians. The code under test
must branch on os.environ[ENV_VAR] == "1" (the experimental path).
Variant order is ABAB...; a warmup pair runs first.
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


def main():
    qname = sys.argv[1]
    env_var = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_session("ab-query")
    fn = registry.queries()[qname]

    def run_once(flag: str) -> float:
        os.environ[env_var] = flag
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    with stats.fast_sums():
        run_once("0"), run_once("1")  # warmup both codegen paths
        a, b = [], []
        for _ in range(reps):
            a.append(run_once("0"))
            b.append(run_once("1"))
    out = {
        "query": qname,
        "env": env_var,
        "sf_dir": sf_dir,
        "reps": reps,
        "base_median": round(statistics.median(a), 4),
        "exp_median": round(statistics.median(b), 4),
        "base_all": [round(x, 4) for x in a],
        "exp_all": [round(x, 4) for x in b],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
