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

    def _identify_derating(self, dws_start: float, max_pf: float, mad_thresh: float) -> DataFrame:
        """Window + per-turbine MAD bin flags (wake_losses.py:1057-1096)."""
        asset = self.plant.asset.where(F.col("type") == "turbine").select(
            "asset_id", "rated_power"
        )
        df = self._base.join(F.broadcast(asset), "asset_id")
        cap = F.col("rated_power")
        df = df.withColumn(
            "_flag_window",
            F.col("WMET_HorWdSpd").between(dws_start, 40.0)
            & ~F.col("WTUR_W").between(0.01 * cap, 1.2 * cap),
        )
        bin_width_frac = 0.04 * (max_pf - 0.01)
        df = df.withColumn(
            "_p_norm", (F.col("WTUR_W") - 0.01 * cap) / (bin_width_frac * cap)
        )
        hi = (F.lit(max_pf) - 0.01) / bin_width_frac
        df = filters.bin_filter(
            df, bin_col="_p_norm", value_col="WMET_HorWdSpd", bin_width=1.0,
            threshold=mad_thresh, center_type="median", threshold_type="mad",
            direction="above", keys=["asset_id"],
            bin_min_col=F.lit(0.0), bin_max_col=hi, flag_col="_flag_bin",
        )
        return df.withColumn(
            "derate_flag", F.col("_flag_window") | F.col("_flag_bin")
        ).drop("_p_norm", "_flag_window", "_flag_bin")

    def _sim_tables(self, run: dict):
        """One simulation's per-time plant table and per-(time, turbine)
        table, both lazy."""
        if self.correct_for_derating:
            df = self._identify_derating(
                run["derating_filter_wind_speed_start"], run["max_power_filter"],
                run["wind_bin_mad_thresh"],
            )
        else:
            df = self._base.withColumn("derate_flag", F.lit(False))
        ref = self._ref
        bin_map, membership = self._freestream_sectors(run["freestream_sector_width"])
        spark = self.plant.spark
        bmap = F.broadcast(spark.createDataFrame(bin_map))
        memb = F.broadcast(spark.createDataFrame(membership))

        wd_to_bin = (
            F.round(F.col("wind_direction_ref") / self.wd_bin_width) * self.wd_bin_width
        ) % 360.0
        ref_b = ref.withColumn("wd_bin", wd_to_bin).join(bmap, "wd_bin")

        # bootstrap multiplicity weights on the time key (UQ)
        if self.UQ:
            w = (
                ref.select("time").sample(withReplacement=True, fraction=1.0,
                                          seed=int(self._rng.integers(2**31)))
                .groupBy("time").agg(F.count("*").alias("w"))
            )
            ref_b = ref_b.join(w, "time", "inner")  # times with w=0 drop out
        else:
            ref_b = ref_b.withColumn("w", F.lit(1))

        df = df.join(ref_b.select("time", "sector", "w"), "time", "inner")

        # freestream representative power/ws per time over NORMAL
        # freestream turbines (wake_losses.py:628-649)
        fs = df.join(memb, ["sector", "asset_id"], "inner").where(~F.col("derate_flag"))
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
        fs_per_time = fs.groupBy("time").agg(
            p_agg.alias("fs_power"), ws_agg.alias("fs_ws")
        )

        per_turb = (
            df.join(fs_per_time, "time", "inner")
            .withColumn(
                "potential_turbine_power",
                F.when(F.col("derate_flag"), F.col("WTUR_W")).otherwise(F.col("fs_power")),
            )
        )
        plant_per_time = per_turb.groupBy("time").agg(
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
                       product: str, num_years: int):
        """Hourly means → ws-bin linreg bias correction → (wd, ws) bin
        grid joined with LT reanalysis frequencies → weighted losses
        (wake_losses.py:1098-1317). Grids collected at bin grain."""
        wsb = self.ws_bin_width_LT_corr
        wdb = self.wd_bin_width_LT_corr
        hourly = (
            plant_per_time.groupBy(F.date_trunc("hour", "time").alias("hour"))
            .agg(
                (F.sum(F.col("wind_direction_ref") * F.col("w")) / F.sum("w")).alias("wd_ref"),
                (F.sum(F.col("fs_ws") * F.col("w")) / F.sum("w")).alias("fs_ws"),
                (F.sum(F.col("actual_plant_power") * F.col("w")) / F.sum("w")).alias("actual"),
                (F.sum(F.col("potential_plant_power") * F.col("w")) / F.sum("w")).alias("potential"),
                (F.sum(F.col(f"ws_rean_{product}") * F.col("w")) / F.sum("w")).alias("ws_rean"),
                F.sum("w").alias("w"),
            )
        ).cache()
        # SCADA freestream ws → reanalysis ws linear map from integer-
        # bin means (wake_losses.py:1127-1149)
        bin_stats = (
            hourly.groupBy(F.round("fs_ws").alias("ws_int"))
            .agg(F.avg("ws_rean").alias("m"), F.count("*").alias("n"))
            .where((F.col("ws_int") >= self.min_ws_bin_lin_reg)
                   & (F.col("n") >= self.bin_count_thresh_lin_reg))
            .toPandas()
        )
        if len(bin_stats) >= 2:
            coef, icpt = reg.ols_fit(bin_stats["ws_int"].to_numpy(), bin_stats["m"].to_numpy())
            slope = float(coef[0])
        else:  # degenerate data: identity map
            slope, icpt = 1.0, 0.0
        no_wakes_thresh = float(np.round(slope * self.no_wakes_ws_thresh_LT_corr + icpt))

        ws_corr = F.lit(slope) * F.col("fs_ws") + F.lit(icpt)
        hourly_b = hourly.withColumn(
            "ws_bin", F.round(ws_corr / wsb) * wsb
        ).withColumn(
            "wd_bin", (F.round(F.col("wd_ref") / wdb) * wdb) % 360.0
        )
        grid = hourly_b.groupBy("wd_bin", "ws_bin").agg(
            F.sum(F.col("actual") * F.col("w")).alias("sum_actual"),
            F.sum(F.col("potential") * F.col("w")).alias("sum_potential"),
            F.sum("w").alias("n"),
        ).toPandas().set_index(["wd_bin", "ws_bin"]).sort_index()

        # LT (wd, ws) frequencies from reanalysis (wake_losses.py:1151-1175)
        rean = self.plant.reanalysis[product]
        end_lt = pd.Timestamp(rean.agg(F.max("time")).first()[0]).floor("h")
        start_lt = end_lt - pd.offsets.DateOffset(years=num_years)
        freqs = (
            rean.where((F.col("time") <= F.lit(end_lt.to_pydatetime()))
                       & (F.col("time") > F.lit(start_lt.to_pydatetime())))
            .withColumn("ws_bin", F.round(F.col("WMETR_HorWdSpd") / wsb) * wsb)
            .withColumn("wd_bin",
                        (F.round(F.col("WMETR_HorWdDir") / wdb) * wdb) % 360.0)
            .groupBy("wd_bin", "ws_bin").agg(F.count("*").alias("cnt"))
            .toPandas().set_index(["wd_bin", "ws_bin"]).sort_index()
        )
        freqs["freq"] = freqs["cnt"] / freqs["cnt"].sum()

        # POR by-ws arrays (sum-based, wake_losses.py:1190-1214)
        ws_index = np.arange(0.0, 31.0, wsb)
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

        by_wd_lt = g.groupby(level=0).sum(min_count=1)
        wd_index = np.arange(0.0, 360.0, wdb)
        by_wd_lt = by_wd_lt.reindex(wd_index)
        wake_lt_wd = (by_wd_lt["actual_e"] / by_wd_lt["potential_e"]).to_numpy()
        by_ws_lt = g.groupby(level=1).sum(min_count=1).reindex(ws_index)
        wake_lt_ws = (by_ws_lt["actual_e"] / by_ws_lt["potential_e"]).to_numpy()

        # per-turbine LT losses from the per-turbine bin grid
        per_turb_hourly = (
            per_turb.join(
                plant_per_time.select("time", "wd_lt_bin"), "time"
            )
            .groupBy(F.date_trunc("hour", "time").alias("hour"), "asset_id")
            .agg(
                (F.sum(F.col("WTUR_W") * F.col("w")) / F.sum("w")).alias("p"),
                (F.sum(F.col("potential_turbine_power") * F.col("w")) / F.sum("w")).alias("pp"),
                F.sum("w").alias("w"),
                F.first(F.col("fs_ws")).alias("fs_ws_any"),
                F.first(F.col("wd_lt_bin")).alias("wd_bin_any"),
            )
        )
        tgrid = (
            per_turb_hourly
            .withColumn("ws_bin", F.round((F.lit(slope) * F.col("fs_ws_any") + F.lit(icpt)) / wsb) * wsb)
            .groupBy("asset_id", F.col("wd_bin_any").alias("wd_bin"), "ws_bin")
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
        t_losses = []
        for t in self.turbine_ids:
            tg = tgrid[tgrid["asset_id"] == t].set_index(["wd_bin", "ws_bin"]).sort_index()
            tj = freqs.join(tg, how="outer")
            tj["mp"] = tj["sp"] / tj["n"]
            tj["mpp"] = tj["spp"] / tj["n"]
            if self.assume_no_wakes_high_ws_LT_corr:
                rated = rated_by_turbine[t]
                fill = tj["mp"].isna() & (tj.index.get_level_values(1) >= no_wakes_thresh)
                tj.loc[fill, "mp"] = rated
                tj.loc[fill, "mpp"] = rated
            t_losses.append(
                1.0 - np.nansum(tj["freq"] * tj["mp"]) / np.nansum(tj["freq"] * tj["mpp"])
            )
        hourly.unpersist()
        return lt_loss, np.array(t_losses), wake_lt_wd, wake_por_ws, wake_lt_ws

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
        for n in range(n_sims):
            run = {
                "freestream_sector_width": draw(self.freestream_sector_width),
                "derating_filter_wind_speed_start": draw(self.derating_filter_wind_speed_start),
                "max_power_filter": draw(self.max_power_filter),
                "wind_bin_mad_thresh": draw(self.wind_bin_mad_thresh),
                "num_years_LT": int(draw(self.num_years_LT)),
                "reanalysis_product": (
                    str(rng.choice(self.reanalysis_products)) if self.UQ
                    else self.reanalysis_products[n]
                ),
            }
            plant_per_time, per_turb = self._sim_tables(run)
            plant_per_time = plant_per_time.cache()
            per_turb = per_turb.cache()

            sums = plant_per_time.agg(
                F.sum(F.col("actual_plant_power") * F.col("w")).alias("a"),
                F.sum(F.col("potential_plant_power") * F.col("w")).alias("p"),
            ).first()
            out.wake_losses_por[n] = 1.0 - sums["a"] / sums["p"]

            tsums = (
                per_turb.groupBy("asset_id")
                .agg(F.sum(F.col("WTUR_W") * F.col("w")).alias("a"),
                     F.sum(F.col("potential_turbine_power") * F.col("w")).alias("p"))
                .toPandas().set_index("asset_id")
            )
            out.turbine_wake_losses_por[n] = [
                1.0 - tsums.loc[t, "a"] / tsums.loc[t, "p"] for t in self.turbine_ids
            ]

            wd_sums = (
                plant_per_time.groupBy("wd_lt_bin")
                .agg(F.sum(F.col("actual_plant_power") * F.col("w")).alias("a"),
                     F.sum(F.col("potential_plant_power") * F.col("w")).alias("p"))
                .toPandas().set_index("wd_lt_bin").sort_index()
                .reindex(np.arange(0.0, 360.0, self.wd_bin_width_LT_corr))
            )
            out.wake_losses_por_wd[n] = (wd_sums["a"] / wd_sums["p"]).to_numpy()

            (lt, lt_turb, lt_wd, por_ws, lt_ws) = self._lt_correction(
                plant_per_time, per_turb, run["reanalysis_product"], run["num_years_LT"]
            )
            out.wake_losses_lt[n] = lt
            out.turbine_wake_losses_lt[n] = lt_turb
            out.wake_losses_lt_wd[n] = lt_wd
            out.wake_losses_por_ws[n] = por_ws
            out.wake_losses_lt_ws[n] = lt_ws
            plant_per_time.unpersist()
            per_turb.unpersist()
        return out
