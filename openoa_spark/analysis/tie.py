"""Turbine long-term gross energy (TIE): filter SCADA per turbine,
daily energy with missing-data correction, cross-turbine correlation
imputation, per-turbine (ws, wd, rho) → energy model, applied to
long-term daily reanalysis.

Parity target (behavior only): openoa/analysis/
turbine_long_term_gross_energy.py:46-565.

Spark-first inversions:
- The reference loops turbines in pandas (scada_dict); here every
  per-turbine step is ONE grouped/windowed DataFrame operation over
  the long (time, asset_id) table — the same plan at 4 or 4,000
  turbines.
- The reference ALSO loops Monte-Carlo sims in an outer python loop
  (turbine_long_term_gross_energy.py:310-328, default num_sim=20,000
  sequential passes). Round 8 batches the sims sim-keyed, like
  analysis/yaw.py and analysis/wake_losses.py: each ``sim_batch``
  chunk explodes per-sim (thresholds) structs onto the flagged base
  table map-side, runs the ENTIRE filter → daily-energy →
  imputation → fit → long-term chain keyed by (sim, asset_id), and
  collects one (sim, gross_gwh) row per sim — ~1 Spark job per chunk
  instead of 2-3 jobs per sim. Every aggregate on the sim-keyed path
  is order-independent (exact decimal sums; sequential array folds
  for the correlations; per-group NumPy fits over day-sorted rows),
  so one batched job and a per-sim loop produce BIT-IDENTICAL results
  (pinned by tests/test_tie.py::test_batched_equals_per_sim).
- Per-turbine model fitting uses groupBy(sim, asset_id).applyInPandas
  (Arrow-batched); the daily reanalysis table it predicts over is
  bucket-grain (~365×years rows), broadcast through the closure.
- The GAM is the engine's P-spline additive model on raw
  (ws, wd, rho) — the same model CLASS as the reference's pygam
  LinearGAM (Eilers-Marx penalized B-splines with pygam's defaults:
  20 cubic splines/feature, 2nd-order difference penalty, λ=0.6),
  reimplemented in NumPy since pygam is unavailable
  (functions/regression.py:PSplineGAM / gam_3param_fit; reference:
  functions.gam_3param at power_curve/functions.py:153-200).
  ``extrapolation`` ("clip" default; "linear" = pygam's edge-tangent
  behavior) is caller-configurable (r7 ADVICE) — see gam_3param_fit
  for why clip is the default.
- Stated model tolerance (pinned by tests/test_regression_gam.py::
  test_pspline_power_curve_deviation_envelope on the reference's own
  power-curve shapes): RMS ≤0.6% of rated, ≤0.5% pointwise away from
  slope discontinuities, ≤5% within ±1.5 m/s of a hard rated-power
  knee — any smooth penalized basis, pygam included, rounds the
  corner. Gross-energy numbers from this pipeline carry that envelope
  on top of statistical recovery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from openoa_spark.functions import met
from openoa_spark.functions.regression import gam_3param_fit
from openoa_spark.functions.stats import davg, dsum
from openoa_spark.operators import filters
from openoa_spark.operators.imputing import impute_all_assets_by_correlation
from openoa_spark.operators.timeseries import resample
from openoa_spark.plant import PlantData


@dataclass
class TIEResult:
    plant_gross_gwh: np.ndarray  # one entry per sim (or per product, no-UQ)
    inputs: pd.DataFrame         # per-sim sampled parameters
    turbine_lt_gross: pd.DataFrame | None = None  # last sim: (day × turbine) energy

    @property
    def plant_gross_mean(self) -> float:
        return float(np.mean(self.plant_gross_gwh))


@dataclass
class TurbineLongTermGrossEnergy:
    """Parameters mirror turbine_long_term_gross_energy.py:100-130;
    scalar values are used when UQ=False, (min, max) sampling ranges
    when UQ=True. ``sim_batch`` bounds how many sims share one
    sim-keyed Spark pass (memory knob: each chunk's working set is
    sims-in-chunk × the base table); ``extrapolation`` is the GAM
    edge behavior ("clip" default, "linear" = pygam's)."""

    plant: PlantData
    reanalysis_products: list[str] | None = None
    UQ: bool = False
    num_sim: int = 100
    uncertainty_scada: float = 0.005
    wind_bin_threshold: float | tuple[float, float] = (1.0, 3.0)
    max_power_filter: float | tuple[float, float] = (0.8, 0.9)
    correction_threshold: float | tuple[float, float] = (0.85, 0.95)
    extrapolation: str = "clip"
    sim_batch: int = 25
    seed: int = 42

    _daily_reanalysis_memo: dict = field(init=False, default_factory=dict)
    _por_memo: dict = field(init=False, default_factory=dict)

    def __post_init__(self):
        if self.reanalysis_products is None:
            self.reanalysis_products = sorted(self.plant.reanalysis)
        self._freq_s = self.plant.metadata.scada.frequency_seconds or 600.0
        self._expected_count = 86400.0 / self._freq_s

    # ------------------------------------------------------------ stages

    def _base_flags(self) -> DataFrame:
        """The sim-INDEPENDENT part of the filter cascade, computed once
        per run (turbine_long_term_gross_energy.py:330-388): range flag
        on ws, derate/curtailment window flag, frozen-sensor flag, and
        the normalized power-bin coordinate. The expensive ordered
        window (frozen flag) runs BEFORE the per-sim explode, so it is
        never multiplied by the sim count."""
        asset = self.plant.asset.where(F.col("type") == "turbine").select(
            "asset_id", "rated_power"
        )
        df = (
            self.plant.scada
            .dropna(subset=["WMET_HorWdSpd", "WTUR_SupWh"])
            .join(F.broadcast(asset), "asset_id", "inner")
        )
        cap = F.col("rated_power")
        df = df.withColumn(
            "_flag_range", filters.range_flag("WMET_HorWdSpd", 0.0, 40.0)
        ).withColumn(
            "_flag_window",
            F.col("WMET_HorWdSpd").between(5.0, 40.0)
            & ~F.col("WTUR_W").between(0.02 * cap, 1.2 * cap),
        )
        df = filters.unresponsive_flag(
            df, "WMET_HorWdSpd", threshold=3, time_col="time",
            keys=["asset_id"], flag_col="_flag_frozen",
        )
        # per-turbine power bins at 6% of rated power, domain
        # [round(1% cap), round(max_power_filter·cap)) — normalized so
        # one scalar-width grouped aggregate handles every turbine
        return df.withColumn(
            "_p_norm",
            (F.col("WTUR_W") - F.round(0.01 * cap)) / (0.06 * cap),
        )

    def _sim_keyed_filtered(self, base: DataFrame, sims: pd.DataFrame) -> DataFrame:
        """Explode the per-sim parameter structs (sim, wind-bin
        threshold, max-power filter, correction threshold) onto the
        base rows map-side — no shuffle, the yaw/wake batching idiom —
        then run the per-turbine power-bin filter keyed by
        (sim, asset_id) with per-sim Column thresholds. std via exact
        decimal sums so the flags are bit-stable whatever the
        batching."""
        entries = F.array(*[
            F.struct(
                F.lit(int(r.sim)).alias("sim"),
                F.lit(float(r.wind_bin_thresh)).alias("_wbt"),
                F.lit(float(r.max_power_filter)).alias("_mpf"),
                F.lit(float(r.correction_threshold)).alias("_ct"),
            )
            for r in sims.itertuples()
        ])
        df = (
            base.withColumn("_s", F.explode(entries))
            .withColumn("sim", F.col("_s.sim"))
            .withColumn("_wbt", F.col("_s._wbt"))
            .withColumn("_mpf", F.col("_s._mpf"))
            .withColumn("_ct", F.col("_s._ct"))
            .drop("_s")
        )
        cap = F.col("rated_power")
        hi = (F.round(F.col("_mpf") * cap) - F.round(0.01 * cap)) / (0.06 * cap)
        df = filters.bin_filter(
            df, bin_col="_p_norm", value_col="WMET_HorWdSpd", bin_width=1.0,
            threshold=F.col("_wbt"), center_type="median", threshold_type="std",
            direction="all", keys=["sim", "asset_id"],
            bin_min_col=F.lit(0.0), bin_max_col=hi, flag_col="_flag_bin",
            std_strategy="sums",
        )
        return df.withColumn(
            "_flag_final",
            F.col("_flag_range") | F.col("_flag_window")
            | F.col("_flag_bin") | F.col("_flag_frozen"),
        )

    def filter_turbine_data(
        self, wind_bin_thresh: float, max_power_filter: float
    ) -> DataFrame:
        """Single-parameter-set flagging (the per-sim surface the tests
        and per-stage callers use) — one sim through the same sim-keyed
        path ``run()`` batches, so there is exactly one code path."""
        sims = pd.DataFrame({
            "sim": [0],
            "wind_bin_thresh": [float(wind_bin_thresh)],
            "max_power_filter": [float(max_power_filter)],
            "correction_threshold": [float("nan")],
        })
        return self._sim_keyed_filtered(self._base_flags(), sims).drop(
            "sim", "_wbt", "_mpf", "_ct", "_p_norm"
        )

    def _scada_por(self):
        """(first day, last day) of the SCADA POR; memoized — one job
        per run, shared by every chunk's spine."""
        if "por" not in self._por_memo:
            self._por_memo["por"] = self.plant.scada.agg(
                F.date_trunc("day", F.min("time")).alias("lo"),
                F.date_trunc("day", F.max("time")).alias("hi"),
            ).first()
        return self._por_memo["por"]

    def _daily_valid_energy_keyed(
        self, filtered: DataFrame, sims: pd.DataFrame
    ) -> DataFrame:
        """Daily per-(sim, turbine) sums with missing-data correction;
        days below the per-sim reported-data threshold dropped, then
        gap-spine + cross-turbine correlation imputation keyed by sim
        (turbine_long_term_gross_energy.py:419-495). Daily sums are
        exact decimal sums (order-independent across batchings)."""
        daily = resample(
            filtered.where(~F.col("_flag_final")),
            "time", "D",
            {
                "_e": dsum("WTUR_SupWh", scale=9, precision=32),
                "_n": F.count("WTUR_SupWh"),
                "_ct": F.min("_ct"),  # constant within a sim
            },
            keys=["sim", "asset_id"], bucket_col="day",
        )
        daily = daily.withColumn(
            "energy_corrected", F.col("_e") * F.lit(self._expected_count) / F.col("_n")
        ).where(F.col("_n") >= F.col("_ct") * F.lit(self._expected_count))
        # full (sim × day × turbine) spine so imputation sees the gaps
        por = self._scada_por()
        spark = self.plant.spark
        sims_df = spark.createDataFrame(
            [(int(s),) for s in sims["sim"]], "sim int"
        )
        spine = (
            spark.range(1).select(
                F.explode(
                    F.sequence(F.lit(por["lo"]), F.lit(por["hi"]),
                               F.expr("interval 1 day"))
                ).alias("day")
            ).crossJoin(
                self.plant.asset.where(F.col("type") == "turbine").select("asset_id")
            ).crossJoin(F.broadcast(sims_df))
        )
        gapped = spine.join(
            daily.select("sim", "day", "asset_id", "energy_corrected"),
            ["sim", "day", "asset_id"], "left",
        )
        imputed = impute_all_assets_by_correlation(
            gapped, "day", "asset_id", "energy_corrected", group_cols=["sim"]
        ).withColumnRenamed("energy_corrected", "energy_imputed")
        return imputed.dropna(subset=["energy_imputed"])

    def daily_valid_energy(self, filtered: DataFrame, correction_threshold: float) -> DataFrame:
        """Single-parameter-set daily energy (per-sim surface): one sim
        through the sim-keyed path."""
        keyed = filtered.withColumn("sim", F.lit(0)).withColumn(
            "_ct", F.lit(float(correction_threshold))
        )
        return self._daily_valid_energy_keyed(
            keyed, pd.DataFrame({"sim": [0]})
        ).drop("sim")

    def daily_reanalysis(self, product: str) -> pd.DataFrame:
        """Daily means of u/v/ws/rho with wd recomputed from the daily
        mean components (turbine_long_term_gross_energy.py:390-416);
        memoized per product. Collected: bucket grain."""
        if product in self._daily_reanalysis_memo:
            return self._daily_reanalysis_memo[product]
        df = self.plant.reanalysis[product]
        cols = set(df.columns)
        if not {"WMETR_HorWdSpdU", "WMETR_HorWdSpdV"} <= cols:
            u, v = met.compute_u_v_components("WMETR_HorWdSpd", "WMETR_HorWdDir")
            df = df.withColumn("WMETR_HorWdSpdU", u).withColumn("WMETR_HorWdSpdV", v)
        agg = resample(
            df, "time", "D",
            {
                "u": F.avg("WMETR_HorWdSpdU"), "v": F.avg("WMETR_HorWdSpdV"),
                "ws": F.avg("WMETR_HorWdSpd"), "rho": F.avg("WMETR_AirDen"),
            },
            bucket_col="day",
        ).withColumn("wd", met.compute_wind_direction("u", "v"))
        pdf = agg.toPandas().set_index("day").sort_index()
        self._daily_reanalysis_memo[product] = pdf
        return pdf

    def _fit_and_apply_keyed(
        self, scada_valid: DataFrame, sim_lookup: dict[int, tuple[str, float]]
    ) -> DataFrame:
        """Per-(sim, turbine) model fit + long-term prediction in one
        applyInPandas over groupBy(sim, asset_id)
        (turbine_long_term_gross_energy.py:497-565). ``sim_lookup``
        maps sim → (reanalysis product, scada_data_fraction); the
        bucket-grain daily reanalysis tables ship through the closure.
        Groups are day-SORTED before fitting so the NumPy solve sees a
        deterministic row order whatever the shuffle layout. Returns
        (sim, asset_id, day, gross) over the full reanalysis span."""
        from openoa_spark.session import ship_package

        ship_package(scada_valid.sparkSession)  # closure refs gam_3param_fit
        rean_by_product = {
            p: self.daily_reanalysis(p).reset_index()[["day", "ws", "wd", "rho"]]
            for p in sorted({prod for prod, _ in sim_lookup.values()})
        }
        extrap = self.extrapolation
        schema = StructType([
            StructField("sim", IntegerType()),
            StructField("asset_id", StringType()),
            StructField("day", TimestampType()),
            StructField("gross", DoubleType()),
        ])

        def fit_predict(key, pdf):
            sim, t = int(key[0]), key[1]
            product, fraction = sim_lookup[sim]
            rean_reset = rean_by_product[product]
            merged = (
                pdf.sort_values("day")
                .merge(rean_reset, on="day", how="inner")
                .dropna(subset=["energy_imputed", "ws", "wd", "rho"])
            )
            if len(merged) < 10:
                return pd.DataFrame(columns=["sim", "asset_id", "day", "gross"])
            y = merged["energy_imputed"].to_numpy() * fraction
            model = gam_3param_fit(
                merged["ws"].to_numpy(), merged["wd"].to_numpy(),
                merged["rho"].to_numpy(), y, extrapolation=extrap,
            )
            pred = np.maximum(
                model(rean_reset["ws"].to_numpy(), rean_reset["wd"].to_numpy(),
                      rean_reset["rho"].to_numpy()),
                0.0,
            )
            return pd.DataFrame({
                "sim": sim, "asset_id": t, "day": rean_reset["day"], "gross": pred,
            })

        return (
            scada_valid.select("sim", "asset_id", "day", "energy_imputed")
            .groupBy("sim", "asset_id")
            .applyInPandas(fit_predict, schema)
        )

    def fit_and_apply(
        self, scada_valid: DataFrame, product: str, scada_fraction: float
    ) -> DataFrame:
        """Single-parameter-set fit+predict (per-sim surface): one sim
        through the sim-keyed path."""
        keyed = (
            scada_valid if "sim" in scada_valid.columns
            else scada_valid.withColumn("sim", F.lit(0))
        )
        return self._fit_and_apply_keyed(
            keyed, {0: (product, float(scada_fraction))}
        ).drop("sim")

    def _plant_gross_by_sim(self, preds: DataFrame) -> DataFrame:
        """Monthly sums per (sim, turbine) → calendar-month mean →
        per-sim total (turbine_long_term_gross_energy.py:536-563), in
        GWh (input kWh). Exact decimal sums at every level so the
        totals are order-independent."""
        monthly = resample(
            preds, "day", "MS",
            {"e": dsum("gross", scale=9, precision=32)},
            keys=["sim", "asset_id"], bucket_col="month",
        )
        cal = monthly.groupBy(
            "sim", "asset_id", F.month("month").alias("cal_month")
        ).agg(davg("e", scale=9, precision=32).alias("e_avg"))
        return cal.groupBy("sim").agg(
            (dsum("e_avg", scale=9, precision=32) / F.lit(1e6)).alias("gross_gwh")
        )

    def plant_gross_from_predictions(self, preds: DataFrame) -> float:
        """Single-sim total (per-sim surface)."""
        keyed = (
            preds if "sim" in preds.columns
            else preds.withColumn("sim", F.lit(0))
        )
        rows = self._plant_gross_by_sim(keyed).collect()
        return float(rows[0]["gross_gwh"]) if rows else 0.0

    # ------------------------------------------------------------ run

    def run(self, num_sim: int | None = None, sim_batch: int | None = None) -> TIEResult:
        rng = np.random.default_rng(self.seed)
        if self.UQ:
            n = num_sim or self.num_sim
            inputs = pd.DataFrame({
                "reanalysis_product": rng.choice(self.reanalysis_products, n),
                "scada_data_fraction": rng.normal(1.0, self.uncertainty_scada, n),
                "wind_bin_thresh": rng.integers(
                    int(self.wind_bin_threshold[0] * 100),
                    int(self.wind_bin_threshold[1] * 100), n) / 100.0,
                "max_power_filter": rng.integers(
                    int(self.max_power_filter[0] * 100),
                    int(self.max_power_filter[1] * 100), n) / 100.0,
                "correction_threshold": rng.integers(
                    int(self.correction_threshold[0] * 100),
                    int(self.correction_threshold[1] * 100), n) / 100.0,
            })
        else:
            def _scalar(v, default):
                return float(v) if np.isscalar(v) else default
            inputs = pd.DataFrame({
                "reanalysis_product": self.reanalysis_products,
                "scada_data_fraction": 1.0,
                "wind_bin_thresh": _scalar(self.wind_bin_threshold, 2.0),
                "max_power_filter": _scalar(self.max_power_filter, 0.85),
                "correction_threshold": _scalar(self.correction_threshold, 0.90),
            })

        n_total = len(inputs)
        base = self._base_flags().cache()
        # memory-adaptive chunk size: the configured sim_batch is a
        # CAP; at large row counts the chunk shrinks so the rows×sims
        # fan-out fits the live heap (session.auto_sim_batch — r8
        # probe OOM'd the fixed default at ×16 rows). count() also
        # materializes the cache before the sim loop races it.
        from openoa_spark.session import auto_sim_batch

        batch = auto_sim_batch(
            base.sparkSession, base.count(), int(sim_batch or self.sim_batch)
        )
        gross = np.empty(n_total)
        lt = None
        try:
            for lo in range(0, n_total, batch):
                chunk = inputs.iloc[lo:lo + batch]
                sims = pd.DataFrame({
                    "sim": chunk.index.astype(int),
                    "wind_bin_thresh": chunk["wind_bin_thresh"].astype(float),
                    "max_power_filter": chunk["max_power_filter"].astype(float),
                    "correction_threshold": chunk["correction_threshold"].astype(float),
                })
                thr_cols = [
                    "wind_bin_thresh", "max_power_filter",
                    "correction_threshold",
                ]
                combos = (
                    sims[thr_cols].drop_duplicates().reset_index(drop=True)
                )
                if len(combos) < len(sims):
                    # sims sharing a threshold combo share ONE
                    # filter/daily-energy/imputation chain (the non-UQ
                    # case runs len(products) sims with IDENTICAL
                    # thresholds — round 7's filter_memo collapsed
                    # those; the sim-keyed chain does the same by
                    # keying on the distinct combo and expanding the
                    # day-grain result to member sims through a
                    # broadcast map). Per-sim results are identical by
                    # construction: same thresholds → same rows.
                    combos_g = combos.copy()
                    combos_g.insert(0, "sim", combos_g.index.astype(int))
                    filtered = self._sim_keyed_filtered(base, combos_g)
                    valid_g = self._daily_valid_energy_keyed(
                        filtered, combos_g
                    )
                    gid_map = sims.merge(
                        combos_g.rename(columns={"sim": "_gid"}),
                        on=thr_cols,
                    )[["_gid", "sim"]]
                    map_df = self.plant.spark.createDataFrame(
                        gid_map, "_gid long, sim long"
                    )
                    valid = (
                        valid_g.withColumnRenamed("sim", "_gid")
                        .join(F.broadcast(map_df), "_gid")
                        .drop("_gid")
                    )
                else:
                    filtered = self._sim_keyed_filtered(base, sims)
                    valid = self._daily_valid_energy_keyed(filtered, sims)
                lookup = {
                    int(i): (str(r["reanalysis_product"]), float(r["scada_data_fraction"]))
                    for i, r in chunk.iterrows()
                }
                preds = self._fit_and_apply_keyed(valid, lookup)
                last_chunk = lo + batch >= n_total
                if last_chunk:
                    preds = preds.cache()  # feeds the totals AND the lt collect
                totals = {
                    int(r["sim"]): float(r["gross_gwh"])
                    for r in self._plant_gross_by_sim(preds).collect()
                }
                for i in chunk.index:
                    gross[i] = totals.get(int(i), 0.0)
                if last_chunk:
                    last_sim = int(inputs.index[-1])
                    lt = (
                        preds.where(F.col("sim") == last_sim)
                        .drop("sim").toPandas()
                    )
                    preds.unpersist()
        finally:
            base.unpersist()
        return TIEResult(gross, inputs, lt)
