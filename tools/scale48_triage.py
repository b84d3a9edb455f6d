"""Factor-48 engine-only scaling triage for non-bench heavy queries
(round 12, third session).

The r12 ×48 paired legs (tools/sf1_bench.py) exposed two real scale
gaps (lm_score, chunk_dedup) that eight rounds of sf0.1 measurement
could not see — but only for the 5 bench heavies plus
near_dedup_keep_best. This runner extends the evidence class to the
rest of the expensive family (kmeans/pq/similarity/LSH/dedup/cohort),
engine-only so one pathological DuckDB twin cannot poison the page
cache for every query after it (the r10 sf1_bench lesson; ratios to
the twin are a separate, per-query paired follow-up for anything this
triage flags).

Signal: wall(×48) / wall(sf0.1) per query, both measured in the SAME
process minutes apart. With 32 cores and a per-job floor that
amortizes, a healthy linear operator lands well UNDER the data factor
(48); a ratio at or above the factor means a superlinear stage or a
parallelism collapse — dig there with plans and a paired leg.

Protocol: per query, 1 warm + 2 timed runs at sf0.1, then 2 timed
runs at ×48 (no separate ×48 warm: both ×48 runs are reported, so a
first-run codegen/AQE-shape delta shows as run1 >> run2 instead of
silently inflating a single number). Deploy-mode plans (fast_sums),
noop sink, one JSONL line per query flushed immediately so an OOM'd
leg keeps every earlier measurement.

Usage: python tools/scale48_triage.py [factor] [query ...]
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
from tools.scale_probe import build_probe_dir  # noqa: E402

QUERIES = [
    # embeddings family (A/B'd at sf0.1 in r12, never scale-probed)
    "kmeans_embedding_clusters", "kmeans_cluster_profile",
    "cluster_balanced_sample_vecs", "cluster_lang_profile",
    "pq_codes_embeddings", "pq_adc_topk", "pq_recall_measured",
    "pq_reconstruction_error", "ivf_pq_topk",
    "semantic_dedup_vecs", "embedding_near_dedup_vecs",
    "ann_recall_lsh", "lsh_knn_topk", "lsh_bucket_counts",
    "mahalanobis_cluster_flag",
    # text/dedup family beyond the bench five
    "token_budget_selection", "doc_token_deciles",
    "minhash_star_near_dups", "minhash_decontaminate_docs",
    "near_dedup_docs", "near_dup_cluster_sizes",
    "bloom_decontaminate_docs", "leakage_safe_split_docs",
    # TPC-H-side multi-shuffle plans
    "customer_rfm_segments", "cohort_retention", "behavior_cohorts",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    names = sys.argv[2:] or QUERIES
    base = "/root/testdata/sf0.1"
    spark = get_session("scale48-triage")
    d = os.path.join("spark-warehouse", "sf1_bench")
    if not (os.environ.get("SF1_REUSE") == "1" and os.path.isdir(d)):
        t0 = time.perf_counter()
        build_probe_dir(spark, base, factor, d)
        print(json.dumps({"built": d, "factor": factor,
                          "build_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    qs = registry.queries()
    with stats.fast_sums():
        for name in names:
            rec = {"query": name, "factor": factor}
            try:
                spark.sparkContext.setJobDescription(f"triage {name} sf0.1")
                _noop(qs[name](spark, base))  # warm (JIT + codegen)
                for k in ("small_1", "small_2"):
                    t0 = time.perf_counter()
                    _noop(qs[name](spark, base))
                    rec[k] = round(time.perf_counter() - t0, 3)
                spark.sparkContext.setJobDescription(f"triage {name} x{factor}")
                for k in ("big_1", "big_2"):
                    t0 = time.perf_counter()
                    _noop(qs[name](spark, d))
                    rec[k] = round(time.perf_counter() - t0, 3)
                small = min(rec["small_1"], rec["small_2"])
                big = min(rec["big_1"], rec["big_2"])
                rec["scaling"] = round(big / small, 2) if small else None
            except Exception as e:  # noqa: BLE001 — a DNF is data
                rec["err"] = f"{type(e).__name__}: {e}"[:300]
            finally:
                spark.sparkContext.setJobDescription(None)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
