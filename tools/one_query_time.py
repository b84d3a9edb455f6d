"""Time one registry query engine-only at an arbitrary data dir.

Usage: python tools/one_query_time.py <sf_dir> <query> [reps]
Prints one JSON line per timed run (flushed), then a summary line.
Deploy-mode plans (fast_sums), noop sink — same methodology as
bench.py's engine side. No warmup run: pass reps>=2 and read run 1
as the cold number, the min of the rest as the warm number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openoa_spark import registry  # noqa: E402
from openoa_spark.functions import stats  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402


def main():
    sf_dir, name = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_session("one-query-time")
    qs = registry.queries()
    ts = []
    with stats.fast_sums():
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
            print(json.dumps({"query": name, "rep": i, "s": ts[-1]}),
                  flush=True)
    print(json.dumps({"query": name, "dir": sf_dir, "runs": ts}), flush=True)


if __name__ == "__main__":
    main()
