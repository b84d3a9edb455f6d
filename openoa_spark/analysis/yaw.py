"""Static yaw misalignment: per (turbine, wind-speed bin), bin power
performance by wind-vane angle, fit a cosine-exponent curve, and read
the misalignment as (cosine-peak offset − mean vane angle).

Parity target (behavior only): openoa/analysis/yaw_misalignment.py:
74-743.

Spark-first inversion: the reference loops turbine × ws-bin in pandas
AND Monte-Carlo sims in an outer python loop; here ONE grouped
aggregation produces every (sim, turbine, ws_bin, vane_bin) cell for
ALL simulations at once — power-curve outlier filtering (pitch
threshold + per-turbine MAD power-bin filter) included, the bootstrap
expressed as deterministic per-(row, sim) Poisson(1) weights — and
only the bin-grain table (sims × turbines × ws_bins × vane bins) is
collected for the tiny driver-side curve fits (pure-NumPy
Levenberg-Marquardt replaces scipy.optimize.curve_fit). At the
reference's default num_sim=100 this is 1 Spark job instead of 100
sequential ones."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from openoa_spark.functions.regression import cos_curve_fit
from openoa_spark.functions.stats import poisson1_weight
from openoa_spark.operators import filters
from openoa_spark.plant import PlantData


@dataclass
class YawMisalignmentResult:
    yaw_misalignment: np.ndarray      # (num_sim, n_turbines): mean over ws bins
    yaw_misalignment_ws: np.ndarray   # (num_sim, n_turbines, n_ws_bins)
    mean_vane_angle: np.ndarray       # (num_sim, n_turbines)
    curve_fit_params_ws: np.ndarray   # (num_sim, n_turbines, n_ws_bins, 3)
    turbine_ids: list
    ws_bins: list

    @property
    def avg(self) -> np.ndarray:
        return np.mean(self.yaw_misalignment, axis=0)

    @property
    def std(self) -> np.ndarray:
        return np.std(self.yaw_misalignment, axis=0)


@dataclass
class StaticYawMisalignment:
    """Parameters mirror yaw_misalignment.py:120-188."""

    plant: PlantData
    turbine_ids: list[str] | None = None
    UQ: bool = False
    num_sim: int = 100
    ws_bins: tuple = (5.0, 6.0, 7.0, 8.0)
    ws_bin_width: float = 1.0
    vane_bin_width: float = 1.0
    min_vane_bin_count: int = 100
    max_abs_vane_angle: float = 25.0
    pitch_thresh: float = 0.5
    num_power_bins: int = 25
    min_power_filter: float = 0.01
    max_power_filter: float | tuple[float, float] = 0.95
    power_bin_mad_thresh: float | tuple[float, float] = 7.0
    use_power_coeff: bool = False
    seed: int = 42

    def __post_init__(self):
        if self.turbine_ids is None:
            self.turbine_ids = self.plant.turbine_ids

    # ------------------------------------------------------------ stages

    def _filtered(self, max_power_filter: float, mad_thresh: float) -> DataFrame:
        """Pitch-angle limit + per-turbine MAD power-bin filter
        (yaw_misalignment.py:495-528), one DataFrame pass."""
        asset = self.plant.asset.where(F.col("type") == "turbine").select(
            "asset_id", "rated_power"
        )
        df = (
            self.plant.scada
            .where(F.col("asset_id").isin(self.turbine_ids))
            .where(F.col("WROT_BlPthAngVal") <= self.pitch_thresh)
            .dropna(subset=["WMET_HorWdSpd", "WTUR_W", "WMET_HorWdDirRel"])
            .join(F.broadcast(asset), "asset_id")
        )
        cap = F.col("rated_power")
        bin_width_frac = (max_power_filter - self.min_power_filter) / self.num_power_bins
        df = df.withColumn(
            "_p_norm",
            (F.col("WTUR_W") - F.lit(self.min_power_filter) * cap)
            / (F.lit(bin_width_frac) * cap),
        )
        df = filters.bin_filter(
            df, bin_col="_p_norm", value_col="WMET_HorWdSpd", bin_width=1.0,
            threshold=mad_thresh, center_type="median", threshold_type="mad",
            direction="all", keys=["asset_id"],
            bin_min_col=F.lit(0.0), bin_max_col=F.lit(float(self.num_power_bins)),
            flag_col="_flag_bin",
        )
        return df.where(~F.col("_flag_bin")).drop("_p_norm", "_flag_bin")

    def _binned_tables_batch(self, specs: list[dict]) -> pd.DataFrame:
        """EVERY simulation's (turbine, ws_bin, vane_bin) cell table in
        ONE Spark aggregation (round-7: the MC loop previously ran one
        job per sim — 100 sequential jobs at the reference's default
        num_sim; a 1000-executor cluster was idle 99% of the time).

        Mechanics:
        - sims sharing a (max_power_filter, mad) filter combination
          share one filtered scan branch (the MC draws come from small
          integer grids, so distinct combos ≪ sims);
        - each branch explodes a per-sim (sim, bseed) struct array —
          rows fan out #sims-in-combo ways map-side, no shuffle;
        - the bootstrap is a DETERMINISTIC per-(row, sim) Poisson(1)
          weight (inverse CDF over an xxhash64-derived uniform) —
          statistically the with-replacement resample of
          yaw_misalignment.py:380-381, but replayable and identical
          whatever the batching;
        - cell means use order-independent decimal sums, so one
          batched job and a per-sim loop produce BIT-IDENTICAL tables
          (pinned by tests/test_yaw_eya.py::test_batched_equals_per_sim).

        Returns the cell grain (sim, asset_id, ws_bin, vane_bin,
        pow_ratio, n, vane_sum): the (sim, turbine, ws_bin) mean vane
        angles are recovered exactly from vane_sum/n driver-side, so a
        second aggregation pass is unnecessary.
        """
        ws_bins_arr = F.array(*[F.lit(float(b)) for b in self.ws_bins])
        half = self.ws_bin_width / 2.0
        by_combo: dict[tuple, list[dict]] = {}
        for s in specs:
            by_combo.setdefault((s["mpf"], s["mad"]), []).append(s)
        branches = []
        for (mpf, mad), ss in by_combo.items():
            df = self._filtered(mpf, mad).withColumn(
                "ws_bin",
                # F.get, not [0]: a wind speed outside EVERY bin
                # filters to an empty array, and ANSI mode turns [0]
                # on an empty array into a runtime error; get() yields
                # NULL, dropped next line
                F.get(
                    F.filter(
                        ws_bins_arr,
                        lambda b: (F.col("WMET_HorWdSpd") >= b - half)
                        & (F.col("WMET_HorWdSpd") < b + half),
                    ),
                    0,
                ),
            ).where(F.col("ws_bin").isNotNull())
            entries = F.array(*[
                F.struct(
                    F.lit(int(s["sim"])).alias("sim"),
                    F.lit(-1 if s["bseed"] is None else int(s["bseed"]))
                    .alias("bseed"),
                )
                for s in ss
            ])
            df = (
                df.withColumn("_s", F.explode(entries))
                .withColumn("sim", F.col("_s.sim"))
                .withColumn("bseed", F.col("_s.bseed"))
                .drop("_s")
            )
            branches.append(df)
        alldf = branches[0]
        for b in branches[1:]:
            alldf = alldf.unionByName(b)
        # Poisson(1) bootstrap count (functions.stats.poisson1_weight);
        # bseed < 0 marks a no-bootstrap sim (weight 1)
        w = poisson1_weight("bseed", "time", "asset_id")
        alldf = alldf.withColumn(
            "_w", F.when(F.col("bseed") < 0, F.lit(1)).otherwise(w)
        ).where(F.col("_w") > 0)
        pow_ref = (
            F.pow(F.col("WMET_HorWdSpd"), 3.0) if self.use_power_coeff else F.lit(1.0)
        )
        alldf = alldf.withColumn("pow_ratio", F.col("WTUR_W") / pow_ref).withColumn(
            "vane_bin",
            F.round(F.col("WMET_HorWdDirRel") / self.vane_bin_width) * self.vane_bin_width,
        )
        return (
            alldf.groupBy("sim", "asset_id", "ws_bin", "vane_bin")
            .agg(
                (
                    F.sum((F.col("_w") * F.col("pow_ratio")).cast("decimal(32,9)"))
                    / F.sum("_w")
                ).cast("double").alias("pow_ratio"),
                F.sum("_w").alias("n"),
                F.sum(
                    (F.col("_w") * F.col("WMET_HorWdDirRel")).cast("decimal(32,9)")
                ).cast("double").alias("vane_sum"),
            )
            .toPandas()
        )

    # ------------------------------------------------------------ run

    def run(self, num_sim: int | None = None) -> YawMisalignmentResult:
        rng = np.random.default_rng(self.seed)
        n_sims = (num_sim or self.num_sim) if self.UQ else 1
        nt, nw = len(self.turbine_ids), len(self.ws_bins)
        out = YawMisalignmentResult(
            np.full((n_sims, nt), np.nan),
            np.full((n_sims, nt, nw), np.nan),
            np.full((n_sims, nt), np.nan),
            np.full((n_sims, nt, nw, 3), np.nan),
            self.turbine_ids, list(self.ws_bins),
        )
        specs = []
        for n in range(n_sims):
            if self.UQ:
                mad = float(rng.integers(
                    int(self.power_bin_mad_thresh[0]), int(self.power_bin_mad_thresh[1]) + 1
                ))
                mpf = float(rng.integers(
                    int(self.max_power_filter[0] * 100),
                    int(self.max_power_filter[1] * 100) + 1,
                )) / 100.0
                boot_seed = int(rng.integers(2**31))
            else:
                mad = float(self.power_bin_mad_thresh) if np.isscalar(
                    self.power_bin_mad_thresh) else float(np.mean(self.power_bin_mad_thresh))
                mpf = float(self.max_power_filter) if np.isscalar(
                    self.max_power_filter) else float(np.mean(self.max_power_filter))
                boot_seed = None
            specs.append({"sim": n, "mpf": mpf, "mad": mad, "bseed": boot_seed})
        cells_all = self._binned_tables_batch(specs)
        # exact (sim, turbine, ws_bin) mean vane angles from the cell
        # sums, in a deterministic (sorted) fold order
        cells_all = cells_all.sort_values(
            ["sim", "asset_id", "ws_bin", "vane_bin"]
        )
        vane_all = (
            cells_all.groupby(["sim", "asset_id", "ws_bin"], as_index=False)
            .agg(vane_sum=("vane_sum", "sum"), n=("n", "sum"))
        )
        vane_all["mean_vane"] = vane_all["vane_sum"] / vane_all["n"]
        for n in range(n_sims):
            cells = cells_all[cells_all["sim"] == n]
            vane_means = vane_all[vane_all["sim"] == n]
            for i, t in enumerate(self.turbine_ids):
                for k, wsb in enumerate(self.ws_bins):
                    sub = cells[(cells["asset_id"] == t) & (cells["ws_bin"] == wsb)]
                    sub = sub[(sub["n"] > self.min_vane_bin_count)
                              & (sub["vane_bin"].abs() <= self.max_abs_vane_angle)]
                    mv = vane_means[
                        (vane_means["asset_id"] == t) & (vane_means["ws_bin"] == wsb)
                    ]["mean_vane"]
                    if len(sub) < 4 or mv.empty:
                        continue
                    params = cos_curve_fit(
                        sub["vane_bin"].to_numpy(), sub["pow_ratio"].to_numpy()
                    )
                    out.curve_fit_params_ws[n, i, k] = params
                    out.yaw_misalignment_ws[n, i, k] = params[1] - float(mv.iloc[0])
                out.yaw_misalignment[n, i] = np.nanmean(out.yaw_misalignment_ws[n, i])
                out.mean_vane_angle[n, i] = float(
                    vane_means[vane_means["asset_id"] == t]["mean_vane"].mean()
                )
        return out
