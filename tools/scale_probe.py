"""Scale-probe: local evidence that the heaviest event queries scale
~linearly in input size.

Inflates the events table N× by TIME-SHIFTING each copy past the end
of the previous one (key cardinality constant, rows-per-key × N — the
growth pattern of a long-running plant / log stream). Every probed
query is expected to scale linearly under this transform:

- asof_hourly_value / upsample paths: per-key ordered windows, rows×N
- user_daily_correlation_pairs: days×N -> day-grain self-join rows×N
- event_sessions / cumulative windows: per-key window rows×N
- resample_hour_mean_by_type: bucket count ×N, hash agg

The inflated copy lives under ./spark-warehouse/scale_probe_sf/ with
symlinks for the untouched tables (testdata itself is read-only).

Usage: python tools/scale_probe.py [base_sf_dir] [factor]
Prints one JSON line per query {name, base_s, scaled_s, factor,
time_ratio, linear_ok} and exits nonzero if any query grows more than
LINEAR_SLACK × factor after subtracting the fixed per-job floor.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openoa_spark import registry  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402

PROBE_QUERIES = [
    "asof_hourly_value",
    "user_daily_correlation_pairs",
    "event_sessions",
    "cumulative_sum_per_user",
    "resample_hour_mean_by_type",
    # stacked-window + aggregate (gaps-and-islands): rows×N
    "state_islands",
    # keyed trailing-frame window with decimal moments: rows×N
    "rolling_zscore_outliers",
    # documents-table datapipe ops (corpus inflated by id-offset copies)
    "exact_dedup_docs",
    "char_entropy_docs",
    "pack_blocks_docs",
    "minhash_near_dups",
    # vocabulary-distributed global rank (the round-3 zipf rewrite):
    # vocab grows ~N under the copy-tag transform, rank stays bucketed
    "zipf_slope",
    # TPC-H join family (round-4 VERDICT instruction #6): lineitem and
    # orders inflated ×N by ORDERKEY-offset copies — join structure
    # replicates per copy (each copy joins within itself), dims fixed.
    # q1: scan + hash agg, groups fixed -> rows×N work
    "q1_pricing_summary",
    # q9: 5-way join into (nation, year) agg -> join output ×N
    "q9_profit_by_nation_year",
    # q18: big-agg on orderkey (keys ×N) + semi-join back
    "q18_large_volume_customers",
    # q21: per-order supplier-count aggregate + anti/semi composition
    "q21_waiting_suppliers",
    # round-4c additions: chunk ownership (hash-shuffle + reassembly,
    # rows×N), bigram explode + bounded global model (rows×N), and the
    # distributed token-budget cumsum (offset table ~constant, rows×N)
    "chunk_dedup_docs",
    "lm_score_docs",
    "token_budget_selection",
    # Gopher quality family: map-only flag projection + bounded
    # per-source agg (rows×N), and the dominant-bigram explode with
    # two map-side-combined aggs (gram rows ×N)
    "gopher_quality_docs",
    "top_ngram_repetition_docs",
    # stride-1 window ownership + token-grain anti-join (rows×N)
    "dup_span_removal_docs",
    # full-outer fingerprint join (rows×N), vocab-grain cumsum
    # (vocab×~N under copy tags), tolerance asof (per-key window rows×N)
    "corpus_version_diff",
    "vocab_coverage_90",
    "asof_tolerance_hourly_value",
    # two chained keyed percentile windows, one sort (rows×N)
    "hampel_outliers",
    # map-only projections + bounded aggs (rows×N scan cost)
    "benford_first_digit",
    "extrapolated_windspeed",
    # checkpoint-once corpus-stat family (post plan-audit sweep)
    "tfidf_top_terms",
    "bigram_pmi_top",
    "source_overlap_matrix",
    "ngram_jaccard_pairs",
    "lang_sampling_weights",
    # round-5: bounded-memory exact grouped median (both regimes) and
    # the star-capped LSH band join (skew-bounded by construction)
    "median_price_by_flag",
    "median_value_by_user",
    "minhash_star_near_dups",
    "p90_price_by_flag",
    "top3_docs_per_source",
    # gram-grain novelty aggregates (gram rows ×N under copy tags)
    "ngram_novelty_by_slice",
    "embedding_norm_outliers",
    "lang_metadata_mismatch",
    # deterministic Lloyd: iters map passes over broadcast centroid
    # literals + bounded (cluster, pos) aggregates -> rows x N
    "kmeans_embedding_clusters",
    # SemDeDup probed through its scale contract (see
    # semantic_dedup_probe): k grows with n, cluster size constant
    "semantic_dedup_scaled_k",
    # k-means riders: d2 carried in the same map pass + k-row agg;
    # per-cluster cap via the window-free grouped_top_k
    "kmeans_cluster_profile",
    "cluster_balanced_sample_vecs",
    # BPE: corpus collapses once to vocab grain (explode rows x N),
    # then 6 vocab-grain pair-count passes
    "bpe_merges_docs",
    "bpe_token_counts_learned",
    # boilerplate set is corpus-size-independent -> collect stays
    # bounded and the clean pass is map-only
    "boilerplate_segment_removal_docs",
    # pure map-only regex chain: rows x N scan cost, zero shuffle
    "pii_redaction_docs",
    # bloom bitmap is fixed-size however many bench grams; probe pass
    # is map-only rows x N, candidate semi-join stays a sliver
    "bloom_decontaminate_docs",
    # dim-grain scale agg (d groups, rows x N partials) + map-only
    # quantize pass
    "embedding_int8_quantization",
    # map-side posexplode fan-out ~n_tok/stride, no shuffle
    "sliding_chunks_docs",
    # m sequential integer k-means fits (broadcast centroids, k*dim
    # update aggs) + one id-grain assembly shuffle: rows x N per pass
    "pq_codes_embeddings",
    # fit + map-only LUT scoring + TakeOrdered top-k: rows x N
    "pq_adc_topk",
    # coarse fit + PQ fit + probed-list ADC: rows x N per pass
    "ivf_pq_topk",
    # |Q| exact TakeOrdered passes + |Q| code-scoring passes: rows x N
    "pq_recall_measured",
    # fit + one extra map-only argmin-d2 pass: rows x N
    "pq_reconstruction_error",
    # round 6: synth + header-decode both live in ONE map stage
    # (payloads never shuffle) -> rows x N scan cost, zero shuffle
    "multimodal_image_metadata",
    "multimodal_audio_metadata",
    "multimodal_corrupt_media",
    # round 7: JPEG segment walk, same synth+decode-in-one-map-stage
    # shape as the PNG/WAV twins — rows x N, zero shuffle
    "multimodal_jpeg_metadata",
    # pipeline prep stages: two bucket-grain hash aggregates (2h ->
    # day), both map-side combined -> rows x N
    "elosses_daily_coverage_energy",
    "tie_daily_corrected_energy",
    # monthly meter aggregate over inflated orders: month count fixed,
    # rows x N partials into a bounded agg
    "aep_monthly_meter_prep",
    # fuzzy decontamination: banded LSH corpus x bench join, bench
    # side bounded -> rows x N signatures + sliver verify
    "minhash_decontaminate_docs",
    # LSH + pointer-doubling CC + map-only hash split: rows x N
    "leakage_safe_split_docs",
    # three regexp_count projections fused into the scan: rows x N
    "encoding_damage_docs",
    # full pixel decode (inflate + unfilter) inside one map stage;
    # only 3 doubles/image shuffle: rows x N
    "multimodal_pixel_stats",
    # full PCM16 sample decode + amplitude stats, same shape
    "multimodal_audio_stats",
    # wake/yaw prep: bucket- and cell-grain hash aggregates, map-side
    # combined: rows x N
    "wake_plant_reference_conditions",
    "yaw_vane_bin_cells",
]
# fixed per-query Spark job floor on local mode (scheduling + codegen
# reuse), subtracted before the linearity check
JOB_FLOOR_S = 0.4
LINEAR_SLACK = 1.8

TABLES = (
    "region nation customer supplier part"
).split()


def build_probe_dir(spark, base_dir: str, factor: int, probe_dir: str) -> None:
    if os.path.exists(probe_dir):
        shutil.rmtree(probe_dir)
    os.makedirs(probe_dir)
    for t in TABLES:
        src = os.path.join(base_dir, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(probe_dir, f"{t}.parquet"))
    ev = registry._t(spark, base_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    span_us = int(
        (bounds["hi"] - bounds["lo"]).total_seconds() * 1_000_000
    ) + 3_600_000_000  # +1h so copies don't touch
    shifted = None
    for i in range(factor):
        c = ev.withColumn(
            "ts", F.timestamp_micros(F.unix_micros("ts") + F.lit(i * span_us))
        ).withColumn(
            # keep event_id unique across copies (dedup/window tiebreaks)
            "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)
        )
        shifted = c if shifted is None else shifted.unionByName(c)
    # registry._t expects the driver's events layout: ts as raw int64
    # NANOseconds (it applies `ts DIV 1000` + timestamp_micros itself)
    shifted = shifted.withColumn(
        "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
    )
    shifted.write.mode("overwrite").parquet(
        os.path.join(probe_dir, "events.parquet")
    )
    # documents x factor: offset doc ids, suffix a copy tag token so
    # copies are NOT exact duplicates of each other (keeps dedup
    # outputs ~factor-proportional instead of collapsing to 1 copy)
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    stacked = None
    for i in range(factor):
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000)
        ).withColumn(
            "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
        )
        stacked = c if stacked is None else stacked.unionByName(c)
    stacked.write.mode("overwrite").parquet(
        os.path.join(probe_dir, "documents.parquet")
    )
    # embeddings x factor: offset vec ids; ROTATE the component list
    # per copy (norm-preserving, so norm/outlier outputs scale exactly
    # x factor while copies land in different LSH buckets / clusters —
    # identical copies would collapse dedup outputs to one copy's
    # worth). Round 5 fix: this table used to be symlinked FIXED, so
    # earlier embedding probe rows exercised x1 data.
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    rotated = None
    for i in range(factor):
        s = i % (dim - 1) + 1 if i else 0
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000_000))
        if s:
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", s + 1, dim - s),
                    F.slice("embedding", 1, s),
                ),
            )
        rotated = c if rotated is None else rotated.unionByName(c)
    rotated.write.mode("overwrite").parquet(
        os.path.join(probe_dir, "embeddings.parquet")
    )
    # lineitem + orders x factor: offset the ORDER KEY on both sides by
    # the same per-copy constant, so each copy's lineitems join its own
    # orders — the join graph replicates x factor while dimension
    # tables (customer/supplier/part/nation) stay fixed. Dates and
    # quantities are untouched, so filters select the same fraction and
    # per-order aggregates (q18's HAVING) keep their per-copy answers.
    key_off = 1_000_000_000
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
    ords = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
    for tname, df, key in (
        ("lineitem", li, "l_orderkey"),
        ("orders", ords, "o_orderkey"),
    ):
        out = None
        for i in range(factor):
            c = df.withColumn(key, F.col(key) + F.lit(i * key_off))
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(
            os.path.join(probe_dir, f"{tname}.parquet")
        )


def semantic_dedup_probe(factor: int, probe_dir: str):
    """SemDeDup under its own scale contract: the registry query pins
    k=8 for the oracle replay, but the production knob is k ~ n /
    target-cluster-size — the within-cluster pair join is quadratic in
    cluster size, linear in n when k scales. The probe therefore runs
    k=8 on the base and k=8*factor on the inflated dir."""
    from openoa_spark.datapipe.similarity import semantic_dedup

    def run(spark, d):
        k = 8 * factor if os.path.abspath(d) == probe_dir else 8
        emb = registry._t(spark, d, "embeddings")
        return semantic_dedup(
            emb, "embedding", "vec_id", k=k, iters=3, threshold=0.25
        ).select("vec_id", "label")

    return run


def timed(fn, spark, d) -> float:
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    subset = sys.argv[3:] or PROBE_QUERIES
    probe = os.path.abspath("spark-warehouse/scale_probe_sf")
    spark = get_session("scale-probe")
    build_probe_dir(spark, base, factor, probe)

    qs = dict(registry.queries())
    qs["semantic_dedup_scaled_k"] = semantic_dedup_probe(factor, probe)
    failures = []
    for name in subset:
        fn = qs[name]
        # warm both sizes once (codegen), then time
        fn(spark, base).write.format("noop").mode("overwrite").save()
        fn(spark, probe).write.format("noop").mode("overwrite").save()
        base_s = timed(fn, spark, base)
        scaled_s = timed(fn, spark, probe)
        # a base run inside the fixed job floor has no measurable
        # data-dependent cost — any ratio against it is noise, so the
        # verdict is "scaled run is cheap in absolute terms" instead
        if base_s - JOB_FLOOR_S < 0.1:
            ratio = float("nan")
            ok = scaled_s <= JOB_FLOOR_S + factor * 0.1 * LINEAR_SLACK
        else:
            ratio = (scaled_s - JOB_FLOOR_S) / (base_s - JOB_FLOOR_S)
            ok = ratio <= factor * LINEAR_SLACK
        print(
            json.dumps(
                {
                    "name": name,
                    "base_s": round(base_s, 3),
                    "scaled_s": round(scaled_s, 3),
                    "factor": factor,
                    "time_ratio": None if ratio != ratio else round(ratio, 2),
                    "linear_ok": ok,
                }
            )
        )
        if not ok:
            failures.append(name)
    if failures:
        print(f"SUPERLINEAR: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
