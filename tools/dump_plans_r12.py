"""Per-query formatted-plan dump for the optimization round: writes
plans/r12/<query>_<tag>.txt for each bench headline query (tag =
before/after), at the bench SF, in fast_sums (deploy) mode — the plan
bench.py times.

Usage: python tools/dump_plans_r12.py <tag> [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openoa_spark import registry  # noqa: E402
from openoa_spark.functions import stats  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump-plans-r12")
    qs = registry.queries()
    with stats.fast_sums():
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan.rstrip() + "\n")
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
