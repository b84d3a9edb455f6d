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
    # r10: customer-grain grid-bucketed global rank + closed-form
    # ntile (the keyless-ntile rewrite) — rfm agg rows ×N, rank
    # stage stays customer-grain
    "customer_rfm_segments",
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
    # round-7: composed prep DAGs end-to-end (every stage is a
    # bucket/time-keyed agg or join -> rows x N); plus the SQL-surface
    # path (create_views + spark.sql: identical plan to the DataFrame
    # route, proven here at x N too)
    "aep_prepare_pipeline",
    "wake_prepare_pipeline",
    # round-8: the batched Monte-Carlo RUN stages under ×factor rows
    # (the sim-keyed joins/aggregates — prepare() alone was probed r7)
    "wake_run_pipeline",
    "yaw_run_pipeline",
    "tie_run_pipeline",
    "plant_sql_daily_turbine_energy",
    # trained LID: train = vocab-grain agg (+ lang-keyed top-k window),
    # apply = explode + broadcast-profile equi-join + (doc, lang) agg
    # -> rows x N scan/agg cost, model size corpus-independent
    "lid_trained_heldout_accuracy",
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


def aep_prep_probe():
    """COMPOSED-pipeline probe (round-7 VERDICT #4): MonteCarloAEP's
    full prepare() DAG — meter resample + nan accounting, curtailment
    resample, gross-energy join, reanalysis bucket aggregate, POR
    alignment, long-term loss table — end-to-end on plant tables
    derived from the (time-shifted, so POR span ×factor) events table.
    Daily resolution; every stage is a bucket-grain hash aggregate or
    bucket-key join, so wall time should track rows ~linearly."""
    from openoa_spark.analysis.aep import MonteCarloAEP
    from openoa_spark.plant import PlantData

    def run(spark, d):
        ev = registry._t(spark, d, "events").where(F.col("value").isNotNull())
        meter = ev.select(
            F.col("ts").alias("time"),
            (F.abs(F.col("value")) * 100).alias("MMTR_SupWh"),
        )
        curtail = ev.select(
            F.col("ts").alias("time"),
            (F.abs(F.col("value")) % 7).alias("IAVL_DnWh"),
            (F.abs(F.col("value")) % 3).alias("IAVL_ExtPwrDnWh"),
        )
        por_rean = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
            (F.avg(F.abs("value")) % 15).alias("WMETR_HorWdSpd"),
            (F.lit(1.2) + F.avg("value") % F.lit(0.1)).alias("WMETR_AirDen"),
        )
        # the LT correction needs >= 1 windiness-year of reanalysis
        # history; testdata events span 30 days at every SF, so build a
        # FIXED-SIZE synthetic hourly backfill before the POR (constant
        # ~10k rows on both the base and the inflated side — it cannot
        # perturb the linearity signal, which lives in the rows x N
        # POR aggregates)
        start = ev.agg(F.min("ts")).first()[0]
        n_back = 24 * 400  # 400 days
        backfill = spark.range(n_back).select(
            F.timestamp_micros(
                F.lit(int(start.timestamp() * 1e6))
                - (F.col("id") + 1) * F.lit(3_600_000_000)
            ).alias("time"),
            (F.lit(5.0) + (F.col("id") % 7).cast("double"))
            .alias("WMETR_HorWdSpd"),
            F.lit(1.2).alias("WMETR_AirDen"),
        )
        rean = backfill.unionByName(por_rean)
        plant = PlantData(
            spark,
            {"latitude": 47.9, "longitude": 5.12, "capacity": 10.0,
             "meter": {"frequency": "h"}, "curtail": {"frequency": "h"},
             "reanalysis": {"era5": {"frequency": "h"}}},
            analysis_type=["MonteCarloAEP"],
            meter=meter, curtail=curtail, reanalysis={"era5": rean},
        )
        mc = MonteCarloAEP(
            plant, time_resolution="D", uncertainty_windiness=(1, 1)
        )
        # the SPARK portion of prepare(): meter aggregate + curtail
        # aggregate + gross-energy join, and the per-product LT
        # reanalysis bucket aggregate. (prepare() itself finishes with
        # a driver-side pandas calendar-mean over the <=500-row
        # collected aggregate and a 366-calendar-day coverage check the
        # 30-day testdata POR cannot satisfy — bounded work with no
        # scale behavior to probe.)
        meter_agg = mc._meter_aggregate()
        curt_agg = mc._curtail_aggregate()
        joined = meter_agg.join(curt_agg, "period", "inner").withColumn(
            "gross_energy_gwh",
            F.col("energy_gwh") + F.col("availability_gwh")
            + F.col("curtailment_gwh"),
        )
        agg = joined.toPandas()          # bounded: bucket grain
        rean_agg = mc._reanalysis_aggregate_df()  # executes Spark aggs
        assert len(rean_agg) > 0
        return spark.createDataFrame(agg[["period", "gross_energy_gwh"]])

    return run


def wake_prep_probe():
    """COMPOSED-pipeline probe: WakeLosses.prepare() end-to-end —
    complete-timestamp filter (time-grain count agg), plant circular-
    mean reference direction, hour-floored reanalysis joins — on a
    4-turbine scada shape derived from events (each event timestamp
    fans out to all four turbines so the completeness filter keeps
    real rows). Returns the materialized base⨝ref fact table the wake
    sims consume; all stages are time-keyed aggregates/joins →
    rows×factor work."""
    from openoa_spark.analysis.wake_losses import WakeLosses
    from openoa_spark.plant import PlantData

    def run(spark, d):
        import pandas as pd

        ev = registry._t(spark, d, "events").where(F.col("value").isNotNull())
        turbs = F.array(*[F.lit(t) for t in ("T0", "T1", "T2", "T3")])
        scada = (
            ev.select("ts", "value", F.explode(turbs).alias("asset_id"))
            .select(
                F.col("ts").alias("time"),
                "asset_id",
                (F.abs("value") % 15).alias("WMET_HorWdSpd"),
                (F.abs("value") * 10).alias("WTUR_W"),
                ((F.abs("value") * 37) % 360).alias("WMET_HorWdDir"),
            )
            .dropDuplicates(["time", "asset_id"])
        )
        rean = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
            (F.avg(F.abs("value")) % 15).alias("WMETR_HorWdSpd"),
            (F.avg(F.abs("value")) % 360).alias("WMETR_HorWdDir"),
        )
        asset = pd.DataFrame({
            "asset_id": ["T0", "T1", "T2", "T3"],
            "latitude": [47.90, 47.90, 47.90, 47.90],
            "longitude": [5.10, 5.1067, 5.1134, 5.1201],
            "rated_power": [2000.0] * 4,
            "hub_height": [80.0] * 4,
            "rotor_diameter": [100.0] * 4,
            "elevation": [400.0] * 4,
            "type": ["turbine"] * 4,
        })
        plant = PlantData(
            spark,
            {"latitude": 47.9, "longitude": 5.11, "capacity": 8.0,
             "scada": {"frequency": "h"},
             "reanalysis": {"era5": {"frequency": "h"}}},
            analysis_type=["WakeLosses-scada"],
            scada=scada, asset=spark.createDataFrame(asset),
            reanalysis={"era5": rean},
        )
        wl = WakeLosses(plant, UQ=False, num_years_LT=1)
        wl.prepare()
        out = wl._base.join(wl._ref, "time")
        # the probe times a fresh prepare() per call: drop the caches
        # prepare() pinned so back-to-back runs don't reuse them
        out = out.localCheckpoint(eager=False)
        wl._base.unpersist()
        wl._ref.unpersist()
        return out

    return run


def wake_run_probe(num_sim: int = 100):
    """RUN-stage probe (round-8): WakeLosses.run(num_sim) end-to-end
    on the same events-derived 4-turbine plant as wake_prepare —
    UQ=True so all ``num_sim`` Monte-Carlo sims flow through the
    sim-keyed batched passes (r7 rewrite). The r7 probes covered
    prepare(); this measures the sim-keyed joins/aggregates under
    ×factor base-table rows: per chunk the fan-out is (sims-in-chunk ×
    rows), every pass a (sim, key)-grain hash aggregate → expected
    rows×factor wall growth. run() returns driver-side scalars, so
    the probe returns a 1-row frame after the work completes."""
    from openoa_spark.analysis.wake_losses import WakeLosses
    from openoa_spark.plant import PlantData

    def run(spark, d):
        import pandas as pd

        ev = registry._t(spark, d, "events").where(F.col("value").isNotNull())
        turbs = F.array(*[F.lit(t) for t in ("T0", "T1", "T2", "T3")])
        scada = (
            ev.select("ts", "value", F.explode(turbs).alias("asset_id"))
            .select(
                F.col("ts").alias("time"),
                "asset_id",
                (F.abs("value") % 15).alias("WMET_HorWdSpd"),
                (F.abs("value") * 10).alias("WTUR_W"),
                ((F.abs("value") * 37) % 360).alias("WMET_HorWdDir"),
            )
            .dropDuplicates(["time", "asset_id"])
        )
        rean = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
            (F.avg(F.abs("value")) % 15).alias("WMETR_HorWdSpd"),
            (F.avg(F.abs("value")) % 360).alias("WMETR_HorWdDir"),
        )
        asset = pd.DataFrame({
            "asset_id": ["T0", "T1", "T2", "T3"],
            "latitude": [47.90] * 4,
            "longitude": [5.10, 5.1067, 5.1134, 5.1201],
            "rated_power": [2000.0] * 4,
            "hub_height": [80.0] * 4,
            "rotor_diameter": [100.0] * 4,
            "elevation": [400.0] * 4,
            "type": ["turbine"] * 4,
        })
        plant = PlantData(
            spark,
            {"latitude": 47.9, "longitude": 5.11, "capacity": 8.0,
             "scada": {"frequency": "h"},
             "reanalysis": {"era5": {"frequency": "h"}}},
            analysis_type=["WakeLosses-scada"],
            scada=scada, asset=spark.createDataFrame(asset),
            reanalysis={"era5": rean},
        )
        wl = WakeLosses(plant, UQ=True, num_years_LT=(1, 1))
        wl.run(num_sim=num_sim)
        wl._base.unpersist()
        wl._ref.unpersist()
        return spark.range(1)

    return run


def yaw_run_probe(num_sim: int = 100):
    """RUN-stage probe (round-8): StaticYawMisalignment.run() with
    UQ=True — all sims' pitch/MAD filters, vane binning and bootstrap
    weights ride ONE batched Spark job (_binned_tables_batch). SCADA
    derives from events (each event fans out to 4 turbines; vane/ws/
    power are deterministic value transforms), so the inflated dir
    runs the same sim count over ×factor rows."""
    from openoa_spark.analysis.yaw import StaticYawMisalignment
    from openoa_spark.plant import PlantData

    def run(spark, d):
        import pandas as pd

        ev = registry._t(spark, d, "events").where(F.col("value").isNotNull())
        turbs = F.array(*[F.lit(t) for t in ("T0", "T1", "T2", "T3")])
        v = F.abs("value")
        ws = v % 4 + 4.5
        vane = (v * 13) % 60 - 30.0
        scada = (
            ev.select("ts", "value", F.explode(turbs).alias("asset_id"))
            .select(
                F.col("ts").alias("time"),
                "asset_id",
                ws.alias("WMET_HorWdSpd"),
                (
                    F.pow(ws, 3) * 2.0
                    * F.pow(F.cos(F.radians(vane)), 2)
                ).alias("WTUR_W"),
                vane.alias("WMET_HorWdDirRel"),
                F.lit(0.0).alias("WROT_BlPthAngVal"),
            )
            .dropDuplicates(["time", "asset_id"])
        )
        asset = pd.DataFrame({
            "asset_id": ["T0", "T1", "T2", "T3"],
            "latitude": [47.90] * 4,
            "longitude": [5.10, 5.1067, 5.1134, 5.1201],
            "rated_power": [2000.0] * 4,
            "hub_height": [80.0] * 4,
            "rotor_diameter": [100.0] * 4,
            "elevation": [400.0] * 4,
            "type": ["turbine"] * 4,
        })
        plant = PlantData(
            spark,
            {"latitude": 47.9, "longitude": 5.11, "capacity": 8.0,
             "scada": {"frequency": "h"}},
            analysis_type=["StaticYawMisalignment"],
            scada=scada, asset=spark.createDataFrame(asset),
        )
        yaw = StaticYawMisalignment(
            plant, UQ=True, num_sim=num_sim, min_vane_bin_count=20,
            max_power_filter=(0.92, 0.98), power_bin_mad_thresh=(4, 10),
        )
        yaw.run()
        return spark.range(1)

    return run


def tie_run_probe(num_sim: int = 100):
    """RUN-stage probe (round-8): TurbineLongTermGrossEnergy.run()
    with UQ=True — the pipeline whose per-sim driver loop was the r7
    verdict's one scale-killer, rewritten sim-keyed this round. The
    probe measures the whole batched chain (per-sim exploded filter
    thresholds, sim-keyed daily energy + gap spine + correlation
    imputation, per-(sim, turbine) GAM fits, calendar-month assembly)
    under ×factor events-derived SCADA; the time-shift inflation
    grows the POR span ×factor, so days — the grain every sim-keyed
    stage works at — scale ×factor."""
    from openoa_spark.analysis.tie import TurbineLongTermGrossEnergy
    from openoa_spark.plant import PlantData

    def run(spark, d):
        import pandas as pd

        ev = registry._t(spark, d, "events").where(F.col("value").isNotNull())
        turbs = F.array(*[F.lit(t) for t in ("T0", "T1", "T2", "T3")])
        v = F.abs("value")
        ws = v % 10 + 5.5
        power = F.pow(ws, 3) * 0.55  # ~2 MW near ws=15
        scada = (
            ev.select("ts", "value", F.explode(turbs).alias("asset_id"))
            .select(
                F.col("ts").alias("time"),
                "asset_id",
                ws.alias("WMET_HorWdSpd"),
                power.alias("WTUR_W"),
                (power / 6.0).alias("WTUR_SupWh"),
            )
            .dropDuplicates(["time", "asset_id"])
        )
        rean = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
            (F.avg(F.abs("value")) % 10 + 5.5).alias("WMETR_HorWdSpd"),
            ((F.avg(F.abs("value")) * 37) % 360).alias("WMETR_HorWdDir"),
            (F.lit(1.2) + F.avg("value") % F.lit(0.1)).alias("WMETR_AirDen"),
        )
        asset = pd.DataFrame({
            "asset_id": ["T0", "T1", "T2", "T3"],
            "latitude": [47.90] * 4,
            "longitude": [5.10, 5.1067, 5.1134, 5.1201],
            "rated_power": [2000.0] * 4,
            "hub_height": [80.0] * 4,
            "rotor_diameter": [100.0] * 4,
            "elevation": [400.0] * 4,
            "type": ["turbine"] * 4,
        })
        plant = PlantData(
            spark,
            {"latitude": 47.9, "longitude": 5.11, "capacity": 8.0,
             "scada": {"frequency": "h"},
             "reanalysis": {"era5": {"frequency": "h"}}},
            analysis_type=["TurbineLongTermGrossEnergy"],
            scada=scada, asset=spark.createDataFrame(asset),
            reanalysis={"era5": rean},
        )
        tie = TurbineLongTermGrossEnergy(plant, UQ=True, num_sim=num_sim)
        tie.run()
        return spark.range(1)

    return run


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
    # round-7: composed pipeline-prep DAGs (operators were probed in
    # r4-r6; their composition was not)
    qs["aep_prepare_pipeline"] = aep_prep_probe()
    qs["wake_prepare_pipeline"] = wake_prep_probe()
    # round-8: the batched MC RUN stages (r7 probed only prepare())
    qs["wake_run_pipeline"] = wake_run_probe()
    qs["yaw_run_pipeline"] = yaw_run_probe()
    qs["tie_run_pipeline"] = tie_run_probe()
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
