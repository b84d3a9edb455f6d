"""Wake-loss estimation: actual vs potential (freestream-derived)
plant energy, long-term corrected by reanalysis (wd, ws) bin
frequencies.

Parity target (behavior only): openoa/analysis/wake_losses.py:53-1330.

Spark-first inversions:
- The reference pivots SCADA to a wide (time × [var, turbine]) frame;
  here data stays LONG (time, asset_id) — every per-turbine step is a
  grouped/windowed op, so the plan is identical at 4 or 4,000 turbines
  and never materializes a 2·N-column row.
- Freestream-turbine sets per wind-direction bin are computed on the
  driver from the collected pair matrices (dimension-sized), then
  broadcast-joined as a (sector, asset_id) membership table.
- The reference's hourly resample + (wd, ws) binning become grouped
  aggregates; only bin-grain grids (≤ 72×31×N rows) are collected for
  the final frequency-weighted arithmetic.
- Bootstrap (UQ) uses per-timestamp multiplicity weights (sample the
  time keys with replacement, count) — semantically the reference's
  row resampling without duplicating fact rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from openoa_spark.functions import met, regression as reg
from openoa_spark.functions.stats import poisson1_weight
from openoa_spark.operators import filters
from openoa_spark.plant import PlantData


@dataclass
class WakeLossesResult:
    wake_losses_por: np.ndarray          # (num_sim,)
    turbine_wake_losses_por: np.ndarray  # (num_sim, n_turbines)
    wake_losses_lt: np.ndarray           # (num_sim,)
    turbine_wake_losses_lt: np.ndarray   # (num_sim, n_turbines)
    wake_losses_por_wd: np.ndarray       # (num_sim, n_wd_bins)
    wake_losses_lt_wd: np.ndarray        # (num_sim, n_wd_bins)
    wake_losses_por_ws: np.ndarray       # (num_sim, n_ws_bins)
    wake_losses_lt_ws: np.ndarray        # (num_sim, n_ws_bins)
    turbine_ids: list[str] = field(default_factory=list)

    @property
    def wake_losses_por_mean(self) -> float:
        return float(np.nanmean(self.wake_losses_por))

    @property
    def wake_losses_lt_mean(self) -> float:
        return float(np.nanmean(self.wake_losses_lt))


@dataclass
class WakeLosses:
    """Parameters mirror wake_losses.py:220-312; scalars when UQ=False,
    (min, max) MC ranges when UQ=True."""

    plant: PlantData
    reanalysis_products: list[str] | None = None
    UQ: bool = False
    num_sim: int = 100
    wind_direction_asset_ids: list[str] | None = None
    wd_bin_width: float = 5.0
    freestream_sector_width: float | tuple[float, float] = 90.0
    freestream_power_method: str = "mean"
    freestream_wind_speed_method: str = "mean"
    correct_for_derating: bool = True
    derating_filter_wind_speed_start: float | tuple[float, float] = 4.5
    max_power_filter: float | tuple[float, float] = 0.95
    wind_bin_mad_thresh: float | tuple[float, float] = 7.0
    wd_bin_width_LT_corr: float = 5.0
    ws_bin_width_LT_corr: float = 1.0
    num_years_LT: int | tuple[int, int] = 20
    assume_no_wakes_high_ws_LT_corr: bool = True
    no_wakes_ws_thresh_LT_corr: float = 13.0
    min_ws_bin_lin_reg: float = 3.0
    bin_count_thresh_lin_reg: int = 50
    seed: int = 42
    # sims per batched Spark pass (round-7): bounds the rows × sims
    # fan-out of the sim-keyed plan; each pass computes every result
    # for its chunk in ~7 jobs, vs ~10 jobs per sim before
    sim_batch: int = 25

    def __post_init__(self):
        if self.reanalysis_products is None:
            self.reanalysis_products = sorted(self.plant.reanalysis)
        self.turbine_ids = self.plant.turbine_ids
        if self.wind_direction_asset_ids is None:
            self.wind_direction_asset_ids = self.turbine_ids
        self._rng = np.random.default_rng(self.seed)
        self._base: DataFrame | None = None
        self._ref: DataFrame | None = None

    # ------------------------------------------------------------ prep

    def prepare(self) -> None:
        """Build the long fact table and the per-time reference table
        (wake_losses.py:983-1054): complete timestamps only, plant
        circular-mean wind direction, hour-floored reanalysis joined on."""
        n_turb = len(self.turbine_ids)
        scada = self.plant.scada.select(
            "time", "asset_id", "WMET_HorWdSpd", "WTUR_W", "WMET_HorWdDir"
        ).where(F.col("asset_id").isin(self.turbine_ids))
        # complete timestamps: every turbine reporting every variable
        complete = (
            scada.where(
                F.col("WMET_HorWdSpd").isNotNull() & F.col("WTUR_W").isNotNull()
                & F.col("WMET_HorWdDir").isNotNull()
            )
            .groupBy("time").agg(F.count("*").alias("_n"))
            .where(F.col("_n") == n_turb)
            .select("time")
        )
        base = scada.join(complete, "time", "inner")
        # plant reference wind direction: circular mean over the
        # designated assets (met.circular_mean, wake_losses.py:1017-1034)
        ref = (
            base.where(F.col("asset_id").isin(self.wind_direction_asset_ids))
            .groupBy("time")
            .agg(met.circular_mean_agg("WMET_HorWdDir").alias("wind_direction_ref"))
        )
        # hour-floored reanalysis join == ffill of hourly onto sub-hourly
        # stamps (wake_losses.py:1036-1054)
        for p in self.reanalysis_products:
            rean = self.plant.reanalysis[p].select(
                F.date_trunc("hour", "time").alias("_hr"),
                F.col("WMETR_HorWdSpd").alias(f"ws_rean_{p}"),
                F.col("WMETR_HorWdDir").alias(f"wd_rean_{p}"),
            )
            ref = ref.withColumn("_hr", F.date_trunc("hour", "time")).join(
                rean, "_hr", "inner"
            ).drop("_hr")
        self._ref = ref.cache()
        self._base = base.join(ref.select("time"), "time", "inner").cache()

    def _freestream_sectors(self, sector_width: float) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Driver-side: freestream turbine set for each wd bin from the
        collected bearing pairs, merged into sectors of constant set
        (wake_losses.py:580-598). Returns (bin→sector map, sector
        membership) as pandas frames ready to broadcast-join."""
        pairs = self.plant.asset_direction_pairs.toPandas()
        pairs = pairs[pairs["asset_a"].isin(self.turbine_ids)
                      & pairs["asset_b"].isin(self.turbine_ids)]
        half = sector_width / 2.0
        wd_bins = np.arange(0.0, 360.0, self.wd_bin_width)
        sets: dict[float, tuple[str, ...]] = {}
        for wd in wd_bins:
            rel = (wd - pairs["bearing_deg"].to_numpy() + 540.0) % 360.0 - 180.0
            waked = set(pairs.loc[np.abs(rel) <= half, "asset_a"])
            sets[wd] = tuple(sorted(set(self.turbine_ids) - waked))
        # merge consecutive bins with identical sets into sectors
        sector_of_bin = {}
        sector_sets: dict[int, tuple[str, ...]] = {}
        sid = -1
        prev = None
        for wd in wd_bins:
            if sets[wd] != prev:
                sid += 1
                sector_sets[sid] = sets[wd]
                prev = sets[wd]
            sector_of_bin[wd] = sid
        # wrap-around: first and last sector share the set → merge
        if sid > 0 and sector_sets[0] == sector_sets[sid]:
            for wd in wd_bins:
                if sector_of_bin[wd] == sid:
                    sector_of_bin[wd] = 0
        bin_map = pd.DataFrame(
            {"wd_bin": list(sector_of_bin), "sector": list(sector_of_bin.values())}
        )
        member_rows = []
        for s, ids in sector_sets.items():
            s_eff = 0 if (s == sid and sid > 0 and sector_sets[0] == sector_sets[sid]) else s
            ids_eff = list(ids)
            if self.UQ and ids_eff:  # resample freestream set (wake_losses.py:603-607)
                ids_eff = list(self._rng.choice(ids_eff, size=len(ids_eff), replace=True))
            for t in set(ids_eff):
                member_rows.append((s_eff, t, float(ids_eff.count(t))))
        membership = pd.DataFrame(member_rows, columns=["sector", "asset_id", "mult"])
        return bin_map, membership

    # ------------------------------------------------------------ per-sim

    def _sim_tables(self, specs: list[dict]):
        """EVERY simulation's per-time plant table and per-(time,
        turbine) table in ONE sim-keyed plan (round-7: the MC loop
        previously ran ~10 Spark jobs PER SIM — 1000 sequential jobs
        at the reference's default num_sim=100).

        Mechanics of the batching:
        - the per-sim freestream sector/membership tables (driver-side
          pandas, bin-grain) are concatenated with a ``sim`` column
          and broadcast ONCE; joining the reference table to the
          (sim, wd_bin)-keyed map fans each TIME row out to its sims —
          a broadcast-join fan-out, no cartesian;
        - per-sim derating parameters arrive as a map-side explode of
          (sim, params) structs over the FULL base table — the
          reference identifies derating BEFORE the bootstrap resample
          (wake_losses.py:551-555), so the bin-filter statistics must
          see every timestamp, not the w>0 subset; the filter runs
          keyed by (sim, asset_id) with the MAD threshold as a per-sim
          column — bin stats stay bin-grain × sims, still tiny;
        - the UQ bootstrap is a deterministic per-(time, sim)
          Poisson(1) weight (functions.stats.poisson1_weight),
          replacing the per-sim df.sample jobs — identical whatever
          the sim chunking;
        - every aggregate downstream keys by sim, so one job computes
          all sims' tables. run() chunks sims (``sim_batch``) to bound
          the rows×sims fan-out.
        """
        spark = self.plant.spark
        bin_maps, membs, seeds = [], [], []
        for s in specs:
            bm, mb = self._freestream_sectors(s["freestream_sector_width"])
            bm = bm.copy()
            bm["sim"] = s["sim"]
            mb = mb.copy()
            mb["sim"] = s["sim"]
            bin_maps.append(bm)
            membs.append(mb)
            seeds.append({
                "sim": s["sim"],
                "_bseed": -1 if s.get("bseed") is None else int(s["bseed"]),
            })
        bmap = F.broadcast(spark.createDataFrame(pd.concat(bin_maps)))
        memb = F.broadcast(spark.createDataFrame(pd.concat(membs)))
        prm = F.broadcast(spark.createDataFrame(pd.DataFrame(seeds)))

        ref = self._ref
        wd_to_bin = (
            F.round(F.col("wind_direction_ref") / self.wd_bin_width) * self.wd_bin_width
        ) % 360.0
        # (sim, wd_bin) map join = the sim fan-out of the time axis
        ref_b = (
            ref.withColumn("wd_bin", wd_to_bin)
            .join(bmap, "wd_bin")
            .join(prm.select("sim", "_bseed"), "sim")
        )
        w = F.when(
            F.col("_bseed") < 0, F.lit(1)
        ).otherwise(poisson1_weight("_bseed", "time"))
        ref_b = ref_b.withColumn("w", w).where(F.col("w") > 0).drop("_bseed")

        if self.correct_for_derating:
            # per-sim derating flags (wake_losses.py:1057-1096) on the
            # FULL base — the reference identifies derating BEFORE the
            # bootstrap resample (wake_losses.py:551-555), so the
            # bin-filter statistics must not see the w>0 filter (r7
            # review fix; the yaw batcher already had this ordering).
            # Sim fan-out here is a map-side explode of the per-sim
            # parameter structs; the window bound and power-bin layout
            # are then per-sim COLUMNS, and normalizing power by the
            # per-sim bin width makes the bin domain [0, 25) for every
            # sim, so one grouped bin filter keyed (sim, asset_id)
            # covers the whole chunk
            entries = F.array(*[
                F.struct(
                    F.lit(int(s["sim"])).alias("sim"),
                    F.lit(float(s["derating_filter_wind_speed_start"]))
                    .alias("_dws"),
                    F.lit(float(s["max_power_filter"])).alias("_mpf"),
                    F.lit(float(s["wind_bin_mad_thresh"])).alias("_mad"),
                )
                for s in specs
            ])
            asset = self.plant.asset.where(F.col("type") == "turbine").select(
                "asset_id", "rated_power"
            )
            df = (
                self._base.join(F.broadcast(asset), "asset_id")
                .withColumn("_s", F.explode(entries))
                .withColumn("sim", F.col("_s.sim"))
                .withColumn("_dws", F.col("_s._dws"))
                .withColumn("_mpf", F.col("_s._mpf"))
                .withColumn("_mad", F.col("_s._mad"))
                .drop("_s")
            )
            cap = F.col("rated_power")
            df = df.withColumn(
                "_flag_window",
                F.col("WMET_HorWdSpd").between(F.col("_dws"), 40.0)
                & ~F.col("WTUR_W").between(0.01 * cap, 1.2 * cap),
            )
            bin_width_frac = 0.04 * (F.col("_mpf") - 0.01)
            df = df.withColumn(
                "_p_norm", (F.col("WTUR_W") - 0.01 * cap) / (bin_width_frac * cap)
            )
            df = filters.bin_filter(
                df, bin_col="_p_norm", value_col="WMET_HorWdSpd", bin_width=1.0,
                threshold=F.col("_mad"), center_type="median",
                threshold_type="mad", direction="above",
                keys=["sim", "asset_id"],
                bin_min_col=F.lit(0.0),
                # (mpf - 0.01) / (0.04 (mpf - 0.01)) == 25 for every sim
                bin_max_col=F.lit(25.0),
                flag_col="_flag_bin",
            )
            df = df.withColumn(
                "derate_flag", F.col("_flag_window") | F.col("_flag_bin")
            ).drop("_p_norm", "_flag_window", "_flag_bin", "rated_power",
                   "_dws", "_mpf", "_mad")
            df = df.join(
                ref_b.select("time", "sim", "sector", "w"),
                ["time", "sim"], "inner",
            )
        else:
            # no derating: the (sim, wd_bin) map join alone fans out
            df = self._base.join(
                ref_b.select("time", "sim", "sector", "w"), "time", "inner"
            ).withColumn("derate_flag", F.lit(False))

        # freestream representative power/ws per (sim, time) over
        # NORMAL freestream turbines (wake_losses.py:628-649)
        fs = df.join(memb, ["sim", "sector", "asset_id"], "inner").where(
            ~F.col("derate_flag")
        )
        if self.freestream_power_method == "mean":
            p_agg = F.sum(F.col("WTUR_W") * F.col("mult")) / F.sum("mult")
        elif self.freestream_power_method == "median":
            p_agg = F.median("WTUR_W")
        else:
            p_agg = F.max("WTUR_W")
        if self.freestream_wind_speed_method == "mean":
            ws_agg = F.sum(F.col("WMET_HorWdSpd") * F.col("mult")) / F.sum("mult")
        else:
            ws_agg = F.median("WMET_HorWdSpd")
        fs_per_time = fs.groupBy("sim", "time").agg(
            p_agg.alias("fs_power"), ws_agg.alias("fs_ws")
        )

        per_turb = (
            df.join(fs_per_time, ["sim", "time"], "inner")
            .withColumn(
                "potential_turbine_power",
                F.when(F.col("derate_flag"), F.col("WTUR_W")).otherwise(F.col("fs_power")),
            )
        )
        plant_per_time = per_turb.groupBy("sim", "time").agg(
            F.first("w").alias("w"),
            F.first("fs_power").alias("fs_power"),
            F.first("fs_ws").alias("fs_ws"),
            F.sum("WTUR_W").alias("actual_plant_power"),
            (
                F.first("fs_power") * F.sum((~F.col("derate_flag")).cast("long"))
                + F.sum(F.when(F.col("derate_flag"), F.col("WTUR_W")).otherwise(0.0))
            ).alias("potential_plant_power"),
        )
        wd_lt_bin = (
            F.round(F.col("wind_direction_ref") / self.wd_bin_width_LT_corr)
            * self.wd_bin_width_LT_corr
        ) % 360.0
        plant_per_time = plant_per_time.join(
            ref.select("time", "wind_direction_ref",
                       *[f"ws_rean_{p}" for p in self.reanalysis_products]),
            "time",
        ).withColumn("wd_lt_bin", wd_lt_bin)
        return plant_per_time, per_turb

    # ------------------------------------------------------------ LT corr

    def _lt_correction(self, plant_per_time: DataFrame, per_turb: DataFrame,
                       specs: list[dict]):
        """Hourly means → ws-bin linreg bias correction → (wd, ws) bin
        grid joined with LT reanalysis frequencies → weighted losses
        (wake_losses.py:1098-1317), for EVERY sim in the chunk at once:
        the hourly/bin/grid aggregates key by sim, the per-sim OLS bias
        maps are fit driver-side from one collected sim-keyed bin table
        and joined back as a broadcast (sim, slope, icpt) frame, and LT
        frequencies are computed once per DISTINCT (product, num_years)
        pair. Grids stay bin-grain × sims — tiny collects. Returns
        {sim: (lt, t_losses, lt_wd, por_ws, lt_ws)}."""
        wsb = self.ws_bin_width_LT_corr
        wdb = self.wd_bin_width_LT_corr
        spark = self.plant.spark
        rean_cols = [f"ws_rean_{p}" for p in self.reanalysis_products]
        hourly = (
            plant_per_time.groupBy(
                "sim", F.date_trunc("hour", "time").alias("hour")
            )
            .agg(
                (F.sum(F.col("wind_direction_ref") * F.col("w")) / F.sum("w")).alias("wd_ref"),
                (F.sum(F.col("fs_ws") * F.col("w")) / F.sum("w")).alias("fs_ws"),
                (F.sum(F.col("actual_plant_power") * F.col("w")) / F.sum("w")).alias("actual"),
                (F.sum(F.col("potential_plant_power") * F.col("w")) / F.sum("w")).alias("potential"),
                *[
                    (F.sum(F.col(c) * F.col("w")) / F.sum("w")).alias(c)
                    for c in rean_cols
                ],
                F.sum("w").alias("w"),
            )
        ).cache()
        # SCADA freestream ws → reanalysis ws linear map from integer-
        # bin means (wake_losses.py:1127-1149), one sim-keyed aggregate
        # collecting every product's bin means; the per-sim OLS picks
        # its sim's product column driver-side
        bin_stats = (
            hourly.groupBy("sim", F.round("fs_ws").alias("ws_int"))
            .agg(
                *[F.avg(c).alias(c) for c in rean_cols],
                F.count("*").alias("n"),
            )
            .where(F.col("ws_int") >= self.min_ws_bin_lin_reg)
            .toPandas()
        )
        coefs = []
        for s in specs:
            bs = bin_stats[
                (bin_stats["sim"] == s["sim"])
                & (bin_stats["n"] >= self.bin_count_thresh_lin_reg)
            ]
            col = f"ws_rean_{s['reanalysis_product']}"
            if len(bs) >= 2:
                coef, icpt = reg.ols_fit(
                    bs["ws_int"].to_numpy(), bs[col].to_numpy()
                )
                slope = float(coef[0])
            else:  # degenerate data: identity map
                slope, icpt = 1.0, 0.0
            coefs.append({"sim": s["sim"], "_slope": slope, "_icpt": icpt})
        coef_pd = pd.DataFrame(coefs)
        coef_df = F.broadcast(spark.createDataFrame(coef_pd))
        slope_of = {c["sim"]: (c["_slope"], c["_icpt"]) for c in coefs}

        ws_corr = F.col("_slope") * F.col("fs_ws") + F.col("_icpt")
        hourly_b = hourly.join(coef_df, "sim").withColumn(
            "ws_bin", F.round(ws_corr / wsb) * wsb
        ).withColumn(
            "wd_bin", (F.round(F.col("wd_ref") / wdb) * wdb) % 360.0
        )
        grid_all = hourly_b.groupBy("sim", "wd_bin", "ws_bin").agg(
            F.sum(F.col("actual") * F.col("w")).alias("sum_actual"),
            F.sum(F.col("potential") * F.col("w")).alias("sum_potential"),
            F.sum("w").alias("n"),
        ).toPandas()

        # LT (wd, ws) frequencies from reanalysis, once per DISTINCT
        # (product, num_years) (wake_losses.py:1151-1175)
        freqs_memo: dict[tuple, pd.DataFrame] = {}
        for s in specs:
            key = (s["reanalysis_product"], int(s["num_years_LT"]))
            if key in freqs_memo:
                continue
            product, num_years = key
            rean = self.plant.reanalysis[product]
            end_lt = pd.Timestamp(rean.agg(F.max("time")).first()[0]).floor("h")
            start_lt = end_lt - pd.offsets.DateOffset(years=num_years)
            fr = (
                rean.where((F.col("time") <= F.lit(end_lt.to_pydatetime()))
                           & (F.col("time") > F.lit(start_lt.to_pydatetime())))
                .withColumn("ws_bin", F.round(F.col("WMETR_HorWdSpd") / wsb) * wsb)
                .withColumn("wd_bin",
                            (F.round(F.col("WMETR_HorWdDir") / wdb) * wdb) % 360.0)
                .groupBy("wd_bin", "ws_bin").agg(F.count("*").alias("cnt"))
                .toPandas().set_index(["wd_bin", "ws_bin"]).sort_index()
            )
            fr["freq"] = fr["cnt"] / fr["cnt"].sum()
            freqs_memo[key] = fr

        # per-turbine bin grids, sim-keyed (wake_losses.py:1216-1317)
        per_turb_hourly = (
            per_turb.join(
                plant_per_time.select("sim", "time", "wd_lt_bin"),
                ["sim", "time"],
            )
            .groupBy(
                "sim", F.date_trunc("hour", "time").alias("hour"), "asset_id"
            )
            .agg(
                (F.sum(F.col("WTUR_W") * F.col("w")) / F.sum("w")).alias("p"),
                (F.sum(F.col("potential_turbine_power") * F.col("w")) / F.sum("w")).alias("pp"),
                F.sum("w").alias("w"),
                F.first(F.col("fs_ws")).alias("fs_ws_any"),
                F.first(F.col("wd_lt_bin")).alias("wd_bin_any"),
            )
        )
        tgrid_all = (
            per_turb_hourly.join(coef_df, "sim")
            .withColumn(
                "ws_bin",
                F.round((F.col("_slope") * F.col("fs_ws_any") + F.col("_icpt")) / wsb) * wsb,
            )
            .groupBy("sim", "asset_id", F.col("wd_bin_any").alias("wd_bin"), "ws_bin")
            .agg(F.sum(F.col("p") * F.col("w")).alias("sp"),
                 F.sum(F.col("pp") * F.col("w")).alias("spp"),
                 F.sum("w").alias("n"))
            .toPandas()
        )
        rated_by_turbine = {
            r["asset_id"]: float(r["rated_power"])
            for r in self.plant.asset.select("asset_id", "rated_power").collect()
            if r["rated_power"] is not None
        }

        ws_index = np.arange(0.0, 31.0, wsb)
        wd_index = np.arange(0.0, 360.0, wdb)
        out: dict[int, tuple] = {}
        for s in specs:
            sim = s["sim"]
            slope, icpt = slope_of[sim]
            no_wakes_thresh = float(
                np.round(slope * self.no_wakes_ws_thresh_LT_corr + icpt)
            )
            freqs = freqs_memo[(s["reanalysis_product"], int(s["num_years_LT"]))]
            grid = (
                grid_all[grid_all["sim"] == sim]
                .drop(columns=["sim"])
                .set_index(["wd_bin", "ws_bin"]).sort_index()
            )

            # POR by-ws arrays (sum-based, wake_losses.py:1190-1214)
            by_ws = grid.groupby(level=1).sum().reindex(ws_index)
            wake_por_ws = (by_ws["sum_actual"] / by_ws["sum_potential"]).to_numpy()

            # frequency-weighted LT losses on the joined bin grid
            g = freqs.join(grid, how="outer")
            g["mean_actual"] = g["sum_actual"] / g["n"]
            g["mean_potential"] = g["sum_potential"] / g["n"]
            if self.assume_no_wakes_high_ws_LT_corr:
                fill = g["mean_actual"].isna() & (
                    g.index.get_level_values(1) >= no_wakes_thresh
                )
                cap_kw = self.plant.metadata.capacity * 1e3
                g.loc[fill, "mean_actual"] = cap_kw
                g.loc[fill, "mean_potential"] = cap_kw
            g["actual_e"] = g["freq"] * g["mean_actual"]
            g["potential_e"] = g["freq"] * g["mean_potential"]
            lt_loss = 1.0 - np.nansum(g["actual_e"]) / np.nansum(g["potential_e"])

            by_wd_lt = g.groupby(level=0).sum(min_count=1).reindex(wd_index)
            wake_lt_wd = (by_wd_lt["actual_e"] / by_wd_lt["potential_e"]).to_numpy()
            by_ws_lt = g.groupby(level=1).sum(min_count=1).reindex(ws_index)
            wake_lt_ws = (by_ws_lt["actual_e"] / by_ws_lt["potential_e"]).to_numpy()

            t_losses = []
            for t in self.turbine_ids:
                tg = (
                    tgrid_all[
                        (tgrid_all["sim"] == sim) & (tgrid_all["asset_id"] == t)
                    ]
                    .drop(columns=["sim", "asset_id"])
                    .set_index(["wd_bin", "ws_bin"]).sort_index()
                )
                tj = freqs.join(tg, how="outer")
                tj["mp"] = tj["sp"] / tj["n"]
                tj["mpp"] = tj["spp"] / tj["n"]
                if self.assume_no_wakes_high_ws_LT_corr:
                    rated = rated_by_turbine[t]
                    fill = tj["mp"].isna() & (
                        tj.index.get_level_values(1) >= no_wakes_thresh
                    )
                    tj.loc[fill, "mp"] = rated
                    tj.loc[fill, "mpp"] = rated
                t_losses.append(
                    1.0 - np.nansum(tj["freq"] * tj["mp"])
                    / np.nansum(tj["freq"] * tj["mpp"])
                )
            out[sim] = (
                lt_loss, np.array(t_losses), wake_lt_wd, wake_por_ws, wake_lt_ws
            )
        hourly.unpersist()
        return out

    # ------------------------------------------------------------ run

    def run(self, num_sim: int | None = None) -> WakeLossesResult:
        if self._base is None:
            self.prepare()
        rng = self._rng

        def draw(v, scale=1.0):
            if self.UQ and isinstance(v, (tuple, list)):
                return float(rng.uniform(v[0], v[1]))
            return float(v) if np.isscalar(v) else float(np.mean(v))

        n_sims = (num_sim or self.num_sim) if self.UQ else len(self.reanalysis_products)
        nt = len(self.turbine_ids)
        n_wd = int(360.0 / self.wd_bin_width_LT_corr)
        n_ws = len(np.arange(0.0, 31.0, self.ws_bin_width_LT_corr))
        out = WakeLossesResult(
            np.empty(n_sims), np.empty((n_sims, nt)), np.empty(n_sims),
            np.empty((n_sims, nt)), np.empty((n_sims, n_wd)),
            np.empty((n_sims, n_wd)), np.empty((n_sims, n_ws)),
            np.empty((n_sims, n_ws)), self.turbine_ids,
        )
        # one spec per sim — drawn in a fixed order BEFORE batching so
        # results are independent of the chunking
        specs = []
        for n in range(n_sims):
            specs.append({
                "sim": n,
                "freestream_sector_width": draw(self.freestream_sector_width),
                "derating_filter_wind_speed_start": draw(self.derating_filter_wind_speed_start),
                "max_power_filter": draw(self.max_power_filter),
                "wind_bin_mad_thresh": draw(self.wind_bin_mad_thresh),
                "num_years_LT": int(draw(self.num_years_LT)),
                "reanalysis_product": (
                    str(rng.choice(self.reanalysis_products)) if self.UQ
                    else self.reanalysis_products[n]
                ),
                "bseed": int(rng.integers(2**31)) if self.UQ else None,
            })
        wd_index = np.arange(0.0, 360.0, self.wd_bin_width_LT_corr)
        # chunk the sims to bound the rows × sims fan-out per pass;
        # every pass computes all of its sims' results in ~7 jobs
        # (vs ~10 jobs PER SIM in the per-sim loop this replaces).
        # The configured sim_batch is a CAP: at large row counts the
        # chunk shrinks so the fan-out fits the live heap
        # (session.auto_sim_batch — the r8 ×16 probe OOM'd the fixed
        # default here; results are bit-identical at any batch size)
        from openoa_spark.session import auto_sim_batch

        batch = auto_sim_batch(
            self._base.sparkSession, self._base.count(), self.sim_batch
        )
        for lo in range(0, n_sims, batch):
            chunk = specs[lo:lo + batch]
            plant_per_time, per_turb = self._sim_tables(chunk)
            plant_per_time = plant_per_time.cache()
            per_turb = per_turb.cache()

            sums = {
                r["sim"]: r
                for r in plant_per_time.groupBy("sim").agg(
                    F.sum(F.col("actual_plant_power") * F.col("w")).alias("a"),
                    F.sum(F.col("potential_plant_power") * F.col("w")).alias("p"),
                ).collect()
            }
            tsums = (
                per_turb.groupBy("sim", "asset_id")
                .agg(F.sum(F.col("WTUR_W") * F.col("w")).alias("a"),
                     F.sum(F.col("potential_turbine_power") * F.col("w")).alias("p"))
                .toPandas().set_index(["sim", "asset_id"])
            )
            wd_sums = (
                plant_per_time.groupBy("sim", "wd_lt_bin")
                .agg(F.sum(F.col("actual_plant_power") * F.col("w")).alias("a"),
                     F.sum(F.col("potential_plant_power") * F.col("w")).alias("p"))
                .toPandas()
            )
            lt_out = self._lt_correction(plant_per_time, per_turb, chunk)

            for s in chunk:
                n = s["sim"]
                out.wake_losses_por[n] = 1.0 - sums[n]["a"] / sums[n]["p"]
                out.turbine_wake_losses_por[n] = [
                    1.0 - tsums.loc[(n, t), "a"] / tsums.loc[(n, t), "p"]
                    for t in self.turbine_ids
                ]
                wds = (
                    wd_sums[wd_sums["sim"] == n]
                    .set_index("wd_lt_bin").sort_index().reindex(wd_index)
                )
                out.wake_losses_por_wd[n] = (wds["a"] / wds["p"]).to_numpy()
                (lt, lt_turb, lt_wd, por_ws, lt_ws) = lt_out[n]
                out.wake_losses_lt[n] = lt
                out.turbine_wake_losses_lt[n] = lt_turb
                out.wake_losses_lt_wd[n] = lt_wd
                out.wake_losses_por_ws[n] = por_ws
                out.wake_losses_lt_ws[n] = lt_ws
            plant_per_time.unpersist()
            per_turb.unpersist()
        return out
