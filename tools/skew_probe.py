"""Adversarial-skew probe for the dedup/LSH family.

Builds a TEMPLATED corpus — the production failure mode for banded
LSH: ~10% of all documents share one template body, so every copy
lands in the same (band, bhash) bucket and an uncapped clique
self-join emits O(m²) pairs. The probe measures, at two template
multiplicities (m and 4m):

- minhash_near_dup_pairs UNCAPPED pair count (demonstrates the m²
  blowup on the small size only — never run uncapped at the large
  size, that's the point),
- minhash_near_dup_pairs with a max_band_bucket cap below both
  multiplicities (star topology for hot buckets): pair count and wall
  time must grow ~linearly in m,
- near_dedup with the cap: kept-set must still collapse the template
  copies to one survivor,
- chunk_dedup: its ownership pass is a map-side-combined hash
  aggregate on chunk fingerprint (no pair join), so a hot chunk is
  absorbed by partial aggregation — time must also stay ~linear.

Usage: python tools/skew_probe.py [base_sf_dir] [out_jsonl]
Prints one JSON line per probe row and exits nonzero on any bound
violation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openoa_spark.datapipe import dedup  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402

TEMPLATE = (
    "breaking news article template body with the standard boilerplate "
    "header navigation footer and subscription banner repeated on every "
    "scraped page of this publisher site"
)


def templated_corpus(spark, base_dir: str, mult: int):
    """documents table with the template slice inflated ``mult``×:
    every doc whose id % 10 == 0 is replaced by the shared template,
    then that slice is stacked mult times (fresh ids). ~10%·mult of
    the result shares one LSH bucket per band."""
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    docs = docs.select("doc_id", "text")
    hot = docs.where(F.col("doc_id") % 10 == 0).withColumn(
        "text", F.lit(TEMPLATE)
    )
    rest = docs.where(F.col("doc_id") % 10 != 0)
    out = rest
    for i in range(mult):
        out = out.unionByName(
            hot.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
        )
    return out.localCheckpoint(eager=True)


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("skew-probe")
    rows = []
    fail = False

    small = templated_corpus(spark, base, 1)
    big = templated_corpus(spark, base, 4)
    m_small = small.where(F.col("text") == TEMPLATE).count()
    m_big = big.where(F.col("text") == TEMPLATE).count()

    # 1. uncapped clique blowup, SMALL size only (the motivation row)
    unc = dedup.minhash_near_dup_pairs(small, "text", "doc_id")
    t_unc = timed(unc)
    n_unc = unc.count()
    rows.append({
        "probe": "minhash_uncapped_small", "template_docs": m_small,
        "pairs": n_unc, "sec": round(t_unc, 2),
        "quadratic_blowup": n_unc >= m_small * (m_small - 1) // 2,
    })

    # 2. capped star: pairs and time ~linear in template multiplicity
    cap = 16  # below both template multiplicities: star path on both sizes
    cp_small = dedup.minhash_near_dup_pairs(
        small, "text", "doc_id", max_band_bucket=cap
    )
    cp_big = dedup.minhash_near_dup_pairs(
        big, "text", "doc_id", max_band_bucket=cap
    )
    timed(cp_small)  # warm
    t_s = timed(cp_small)
    t_b = timed(cp_big)
    n_s, n_b = cp_small.count(), cp_big.count()
    pair_ratio = n_b / max(n_s, 1)
    time_ratio = (t_b + 0.2) / (t_s + 0.2)
    ok = n_s <= 4 * m_small and n_b <= 4 * m_big and pair_ratio <= 6.0 \
        and time_ratio <= 8.0
    rows.append({
        "probe": "minhash_capped_star", "cap": cap,
        "template_docs": [m_small, m_big], "pairs": [n_s, n_b],
        "sec": [round(t_s, 2), round(t_b, 2)],
        "pair_ratio": round(pair_ratio, 2),
        "time_ratio": round(time_ratio, 2), "linear_ok": ok,
    })
    fail |= not ok

    # 3. capped near_dedup still collapses the template to ONE survivor
    kept = dedup.near_dedup(
        big, "text", "doc_id", max_band_bucket=cap
    )
    n_kept_tmpl = kept.where(F.col("text") == TEMPLATE).count()
    rows.append({
        "probe": "near_dedup_capped_collapse",
        "template_docs": m_big, "template_kept": n_kept_tmpl,
        "ok": n_kept_tmpl == 1,
    })
    fail |= n_kept_tmpl != 1

    # 4. chunk_dedup: hot chunks absorbed by map-side combine
    cd_s = dedup.chunk_dedup(small, "text", "doc_id")
    cd_b = dedup.chunk_dedup(big, "text", "doc_id")
    timed(cd_s)  # warm
    t_cs = timed(cd_s)
    t_cb = timed(cd_b)
    ratio = (t_cb + 0.2) / (t_cs + 0.2)
    ok = ratio <= 8.0
    rows.append({
        "probe": "chunk_dedup_hot_chunk",
        "sec": [round(t_cs, 2), round(t_cb, 2)],
        "time_ratio": round(ratio, 2), "linear_ok": ok,
    })
    fail |= not ok

    lines = "\n".join(json.dumps(r) for r in rows)
    print(lines)
    if out_path:
        with open(out_path, "w") as f:
            f.write(lines + "\n")
    if fail:
        print("SKEW BOUND VIOLATED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
