"""8-vs-32-core engine scaling probe at an inflated SF (r12, VERDICT
item 7): the r11 driver scaling block showed ratios ≈1 for
lm_score/minhash/exact_dedup at sf0.1, where fixed job overhead
dominates 0.1–2.5 s queries. This probe re-measures the SAME queries
at a factor-N probe dir (built by sf1_bench/scale_probe) where real
work dominates, separating fixed overhead (washes out) from a
genuinely serial stage (doesn't).

One process per core count (master is fixed at session build):

    SPARK_GRAFT_CPUS=8  python tools/core_probe.py <sf_dir> [query ...]
    SPARK_GRAFT_CPUS=32 python tools/core_probe.py <sf_dir> [query ...]

Engine-only, noop sink, median of 3, warmup first — one JSON line.
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

DEFAULT = ["lm_score_docs", "minhash_near_dups", "exact_dedup_docs"]


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_session("core-probe")
    qs = registry.queries()
    out = {}
    with stats.fast_sums():
        for name in names:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(ts), 4)
    print(json.dumps({
        "metric": "core_probe", "cpus": cpus, "sf_dir": sf_dir,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
