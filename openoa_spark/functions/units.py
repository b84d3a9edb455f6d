"""Unit-conversion expressions.

Parity targets: openoa/utils/unit_conversion.py:13-106 (behavioral
reference only). All pure Column arithmetic — codegen'd, scale-free.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def convert_power_to_energy(power_kw: Column | str, interval_seconds: float) -> Column:
    """kW over a fixed sampling interval → kWh.

    Semantics: unit_conversion.py:13-37 (power * hours-per-interval).
    """
    return _c(power_kw) * F.lit(interval_seconds / 3600.0)


def compute_gross_energy(
    net_energy: Column | str,
    avail: Column | str,
    curt: Column | str,
    avail_type: str = "frac",
    curt_type: str = "frac",
) -> Column:
    """Gross = net + availability + curtailment losses.

    'frac' losses are fractions of gross (reference validates
    avail+curt < 1 and non-negative; invalid rows yield NULL here so
    they can be counted/flagged instead of raising mid-job).
    Semantics: unit_conversion.py:40-89.
    """
    net, a, c = _c(net_energy), _c(avail), _c(curt)
    nonneg = (a >= 0) & (c >= 0)
    if avail_type == "frac" and curt_type == "frac":
        valid = nonneg & (a + c < 1.0)
        return F.when(valid, net / (F.lit(1.0) - a - c))
    if avail_type == "frac" and curt_type == "energy":
        # unit_conversion.py:81: gross = net / (1 - avail_frac) + curt_kwh
        return F.when(nonneg & (a < 1.0), net / (F.lit(1.0) - a) + c)
    if avail_type == "energy" and curt_type == "frac":
        # unit_conversion.py:83: gross = net / (1 - curt_frac) + avail_kwh
        return F.when(nonneg & (c < 1.0), net / (F.lit(1.0) - c) + a)
    if avail_type == "energy" and curt_type == "energy":
        return F.when(nonneg, net + a + c)
    raise ValueError(
        f"avail_type/curt_type must each be 'frac' or 'energy', got "
        f"{avail_type!r}/{curt_type!r}"
    )


def convert_feet_to_meter(x: Column | str) -> Column:
    """Feet → meters. Semantics: unit_conversion.py:92-106."""
    return _c(x) * F.lit(0.3048)
