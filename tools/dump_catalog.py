"""Generate QUERIES.md: the registry catalog — every query name, its
output schema at sf0.001, whether it sits in the driver's 50-slot
hard-verification window, and whether it has a DuckDB oracle twin.
The line-by-line index for auditing SURVEY §2 coverage.

Usage: python tools/dump_catalog.py [out_md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openoa_spark import registry  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402


def main():
    out_md = sys.argv[1] if len(sys.argv) > 1 else "QUERIES.md"
    spark = get_session("dump-catalog")
    qs = registry.queries()
    osql = registry.oracle_sql()
    window = set(list(qs)[:50])
    lines = [
        "# Query catalog",
        "",
        f"{len(qs)} registered queries, {len(osql)} DuckDB oracle twins.",
        "`window` = inside the driver's 50-slot hard-verification window",
        "this round (everything else is verified by",
        "`tools/check_correctness.py` + pytest).",
        "",
        "| # | query | oracle | window | output schema |",
        "|---|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items(), 1):
        df = fn(spark, "/root/testdata/sf0.001")
        schema = ", ".join(f"{c}:{t}" for c, t in df.dtypes)
        if len(schema) > 120:
            schema = schema[:117] + "..."
        lines.append(
            f"| {i} | `{name}` | {'yes' if name in osql else 'rows-only'} | "
            f"{'yes' if name in window else ''} | {schema} |"
        )
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md} ({len(qs)} queries)")


if __name__ == "__main__":
    main()
