"""EYA gap analysis: scalar waterfall decomposing the difference
between a consultant's pre-construction energy yield assessment (EYA)
and operational-assessment (OA) results.

Parity target (behavior only): openoa/analysis/eya_gap_analysis.py:
27-238. Pure driver-side arithmetic on 11 scalars — no DataFrames
involved (the reference takes a PlantData argument only for plotting
context)."""

from __future__ import annotations

from dataclasses import dataclass


def _check_frac(name: str, v: float) -> float:
    if not 0.0 <= v < 1.0:
        raise ValueError(f"The input to '{name}' must be in the range [0, 1).")
    return float(v)


@dataclass
class EYAEstimate:
    """Consultant EYA values (eya_gap_analysis.py:27-54); energies in
    GWh/yr, losses as fractions in [0, 1)."""

    aep: float
    gross_energy: float
    availability_losses: float
    electrical_losses: float
    turbine_losses: float
    blade_degradation_losses: float
    wake_losses: float

    def __post_init__(self):
        for f in ("availability_losses", "electrical_losses", "turbine_losses",
                  "blade_degradation_losses", "wake_losses"):
            _check_frac(f, getattr(self, f))


@dataclass
class OAResults:
    """Operational-assessment values (eya_gap_analysis.py:56-81)."""

    aep: float
    availability_losses: float
    electrical_losses: float
    turbine_ideal_energy: float

    def __post_init__(self):
        for f in ("availability_losses", "electrical_losses"):
            _check_frac(f, getattr(self, f))


@dataclass
class EYAGapAnalysis:
    """compile() returns the waterfall list [EYA AEP, TIE diff,
    availability diff, electrical diff, unaccounted]
    (eya_gap_analysis.py:150-179); appending OA AEP completes the plot
    series the reference draws."""

    eya_estimates: EYAEstimate | dict
    oa_results: OAResults | dict

    def __post_init__(self):
        if isinstance(self.eya_estimates, dict):
            self.eya_estimates = EYAEstimate(**self.eya_estimates)
        if isinstance(self.oa_results, dict):
            self.oa_results = OAResults(**self.oa_results)
        self.compiled_data: list[float] = []

    def run(self) -> list[float]:
        self.compiled_data = self.compile_data()
        return self.compiled_data

    def compile_data(self) -> list[float]:
        eya, oa = self.eya_estimates, self.oa_results
        eya_tie = (
            eya.gross_energy
            * (1.0 - eya.turbine_losses)
            * (1.0 - eya.wake_losses)
            * (1.0 - eya.blade_degradation_losses)
        )
        turb_gross_diff = oa.turbine_ideal_energy - eya_tie
        avail_diff = (eya.availability_losses - oa.availability_losses) * eya_tie
        elec_diff = (eya.electrical_losses - oa.electrical_losses) * eya_tie
        unaccounted = -(eya.aep + turb_gross_diff + avail_diff + elec_diff) + oa.aep
        return [eya.aep, turb_gross_diff, avail_diff, elec_diff, unaccounted]

    @property
    def waterfall(self) -> list[float]:
        """The compiled series plus the OA AEP total."""
        data = self.compiled_data or self.run()
        return data + [self.oa_results.aep]
