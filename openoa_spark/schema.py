"""Declarative plant-table schema system: canonical IEC-61400-25-style
column names, per-table column maps (user name → canonical), Spark
dtypes, declared frequencies, and the per-analysis validation
requirements registry.

Parity targets (behavior only, re-expressed for Spark):
- table metadata classes: openoa/schema/metadata.py:427-969
- PlantMetaData composition + load: openoa/schema/metadata.py:971-1179
- ANALYSIS_REQUIREMENTS: openoa/schema/metadata.py:44-179
- offset-alias normalization: openoa/schema/metadata.py:186-222

Differences by design: dtypes are Spark SQL type strings (casts are
lazy Column expressions, not eager pandas coercion), and frequency
requirements are expressed as a maximum period in seconds so that both
declared offset aliases and data-inferred frequencies check against
the same scalar.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

# ---------------------------------------------------------------- offsets

# pandas-style offset aliases → period seconds (calendar periods use
# their maximum span so "at least monthly" admits 28..31-day months).
_OFFSET_SECONDS = {
    "ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0, "min": 60.0, "h": 3600.0,
    "D": 86400.0, "W": 7 * 86400.0, "MS": 31 * 86400.0, "ME": 31 * 86400.0,
    "QS": 92 * 86400.0, "QE": 92 * 86400.0, "YS": 366 * 86400.0, "YE": 366 * 86400.0,
}
# deprecated aliases still accepted on input (metadata.py:35-41)
_ALIAS_NORMALIZE = {"M": "ME", "H": "h", "T": "min", "S": "s", "L": "ms",
                    "U": "us", "N": "ns", "A": "YE", "Y": "YE", "AS": "YS", "Q": "QE"}


def normalize_offset(freq: str) -> str:
    """Normalize a pandas offset alias ('10min', 'H', 'MS') to the
    modern alias form; numeric multiple prefixes are preserved."""
    i = 0
    while i < len(freq) and (freq[i].isdigit() or freq[i] == "."):
        i += 1
    mult, unit = freq[:i], freq[i:]
    unit = _ALIAS_NORMALIZE.get(unit, unit)
    return f"{mult}{unit}"


def offset_to_seconds(freq: str) -> float:
    """Offset alias → period in seconds ('10min' → 600.0)."""
    norm = normalize_offset(freq)
    i = 0
    while i < len(norm) and (norm[i].isdigit() or norm[i] == "."):
        i += 1
    mult = float(norm[:i]) if i else 1.0
    unit = norm[i:]
    if unit not in _OFFSET_SECONDS:
        raise ValueError(f"unknown offset alias: {freq!r}")
    return mult * _OFFSET_SECONDS[unit]


# Frequency requirement thresholds (seconds): data must be at least
# this fine. Mirrors _at_least_{monthly,daily,hourly} tuples
# (metadata.py:24-32) without enumerating aliases.
AT_LEAST_MONTHLY = 31 * 86400.0
AT_LEAST_DAILY = 86400.0
AT_LEAST_HOURLY = 3600.0

# ---------------------------------------------------------------- tables

# Canonical column name → Spark SQL dtype, per table.
# Names and dtypes follow openoa/schema/metadata.py:427-969.
CANONICAL_DTYPES: dict[str, dict[str, str]] = {
    "scada": {
        "time": "timestamp", "asset_id": "string", "WTUR_W": "double",
        "WMET_HorWdSpd": "double", "WMET_HorWdDir": "double",
        "WMET_HorWdDirRel": "double", "WTUR_TurSt": "string",
        "WROT_BlPthAngVal": "double", "WMET_EnvTmp": "double",
    },
    "meter": {"time": "timestamp", "MMTR_SupWh": "double"},
    "tower": {"time": "timestamp", "asset_id": "string"},
    "status": {"time": "timestamp", "asset_id": "string", "status_id": "bigint",
               "status_code": "bigint", "status_text": "string"},
    "curtail": {"time": "timestamp", "IAVL_ExtPwrDnWh": "double",
                "IAVL_DnWh": "double"},
    "asset": {"asset_id": "string", "latitude": "double", "longitude": "double",
              "rated_power": "double", "hub_height": "double",
              "rotor_diameter": "double", "elevation": "double", "type": "string"},
    "reanalysis": {
        "time": "timestamp", "WMETR_HorWdSpd": "double",
        "WMETR_HorWdSpdU": "double", "WMETR_HorWdSpdV": "double",
        "WMETR_HorWdDir": "double", "WMETR_EnvTmp": "double",
        "WMETR_AirDen": "double", "WMETR_EnvPres": "double",
    },
}

CANONICAL_UNITS: dict[str, dict[str, str]] = {
    "scada": {"WTUR_W": "kW", "WMET_HorWdSpd": "m/s", "WMET_HorWdDir": "deg",
              "WMET_HorWdDirRel": "deg", "WROT_BlPthAngVal": "deg",
              "WMET_EnvTmp": "C"},
    "meter": {"MMTR_SupWh": "kWh"},
    "curtail": {"IAVL_ExtPwrDnWh": "kWh", "IAVL_DnWh": "kWh"},
    "asset": {"latitude": "WGS84", "longitude": "WGS84", "rated_power": "kW",
              "hub_height": "m", "rotor_diameter": "m", "elevation": "m"},
    "reanalysis": {"WMETR_HorWdSpd": "m/s", "WMETR_HorWdSpdU": "m/s",
                   "WMETR_HorWdSpdV": "m/s", "WMETR_HorWdDir": "deg",
                   "WMETR_EnvTmp": "K", "WMETR_AirDen": "kg/m^3",
                   "WMETR_EnvPres": "Pa"},
}


@dataclass
class TableMeta:
    """Metadata for one plant table: user→canonical column map plus a
    declared frequency (time-series tables only)."""

    name: str
    col_map: dict[str, str] = field(default_factory=dict)  # user → canonical
    frequency: str | None = None  # pandas offset alias, e.g. "10min"

    @property
    def dtypes(self) -> dict[str, str]:
        return CANONICAL_DTYPES.get(self.name if self.name != "reanalysis_product"
                                    else "reanalysis", CANONICAL_DTYPES.get(self.name, {}))

    @property
    def frequency_seconds(self) -> float | None:
        return offset_to_seconds(self.frequency) if self.frequency else None

    @classmethod
    def from_dict(cls, name: str, d: dict) -> "TableMeta":
        d = dict(d or {})
        freq = d.pop("frequency", d.pop("freq", None))
        canonical = CANONICAL_DTYPES["reanalysis" if name.startswith("reanalysis") else name]
        # the reference's metadata maps canonical-attr → user-name
        # (metadata.py:483-512); invert to user → canonical here.
        col_map = {str(v): k for k, v in d.items()
                   if k in canonical and v is not None}
        return cls(name=name, col_map=col_map, frequency=freq)


@dataclass
class PlantMetaData:
    """Composed plant schema: one TableMeta per table plus one per
    reanalysis product (metadata.py:971-1179)."""

    scada: TableMeta = field(default_factory=lambda: TableMeta("scada"))
    meter: TableMeta = field(default_factory=lambda: TableMeta("meter"))
    tower: TableMeta = field(default_factory=lambda: TableMeta("tower"))
    status: TableMeta = field(default_factory=lambda: TableMeta("status"))
    curtail: TableMeta = field(default_factory=lambda: TableMeta("curtail"))
    asset: TableMeta = field(default_factory=lambda: TableMeta("asset"))
    reanalysis: dict[str, TableMeta] = field(default_factory=dict)
    latitude: float = 0.0
    longitude: float = 0.0
    capacity: float = 0.0  # MW

    @classmethod
    def from_dict(cls, d: dict) -> "PlantMetaData":
        rean = {
            product: TableMeta.from_dict("reanalysis", sub)
            for product, sub in (d.get("reanalysis") or {}).items()
        }
        return cls(
            scada=TableMeta.from_dict("scada", d.get("scada", {})),
            meter=TableMeta.from_dict("meter", d.get("meter", {})),
            tower=TableMeta.from_dict("tower", d.get("tower", {})),
            status=TableMeta.from_dict("status", d.get("status", {})),
            curtail=TableMeta.from_dict("curtail", d.get("curtail", {})),
            asset=TableMeta.from_dict("asset", d.get("asset", {})),
            reanalysis=rean,
            latitude=float(d.get("latitude", 0.0)),
            longitude=float(d.get("longitude", 0.0)),
            capacity=float(d.get("capacity", 0.0)),
        )

    @classmethod
    def load(cls, source: "str | Path | dict | PlantMetaData") -> "PlantMetaData":
        """dict / .json / .yml(.yaml) / passthrough (metadata.py:1107-1139)."""
        if isinstance(source, PlantMetaData):
            return source
        if isinstance(source, dict):
            return cls.from_dict(source)
        path = Path(source)
        text = path.read_text()
        if path.suffix in (".yml", ".yaml"):
            try:
                import yaml  # optional dependency, gated (env has no pyyaml guarantee)
            except ImportError as exc:  # pragma: no cover
                raise ImportError("pyyaml is required for YAML metadata") from exc
            return cls.from_dict(yaml.safe_load(text))
        return cls.from_dict(json.loads(text))

    def table(self, name: str, product: str | None = None) -> TableMeta:
        if name == "reanalysis":
            if product is None:
                raise ValueError("reanalysis metadata requires a product key")
            return self.reanalysis[product]
        return getattr(self, name)

    def to_dict(self, canonical: bool = False) -> dict:
        """Export in the same {canonical_field: user_column} layout
        ``from_dict`` reads, so a written metadata file round-trips
        (reference plant.py:746-843 export format). ``canonical=True``
        emits identity column maps (export used canonical names)."""

        def one(meta: TableMeta) -> dict:
            out: dict = (
                {} if canonical else {v: k for k, v in meta.col_map.items()}
            )
            if meta.frequency:
                out["frequency"] = meta.frequency
            return out

        return {
            "scada": one(self.scada),
            "meter": one(self.meter),
            "tower": one(self.tower),
            "status": one(self.status),
            "curtail": one(self.curtail),
            "asset": one(self.asset),
            "reanalysis": {p: one(m) for p, m in self.reanalysis.items()},
            "latitude": self.latitude,
            "longitude": self.longitude,
            "capacity": self.capacity,
        }


# ---------------------------------------------------------------- analyses

# Analysis type → {table: (required canonical columns, max period s)}.
# Mirrors ANALYSIS_REQUIREMENTS at openoa/schema/metadata.py:44-179.
ANALYSIS_REQUIREMENTS: dict[str, dict[str, tuple[list[str], float | None]]] = {
    "MonteCarloAEP": {
        "meter": (["MMTR_SupWh"], AT_LEAST_MONTHLY),
        "curtail": (["IAVL_DnWh", "IAVL_ExtPwrDnWh"], AT_LEAST_MONTHLY),
        "reanalysis": (["WMETR_HorWdSpd", "WMETR_AirDen"], AT_LEAST_MONTHLY),
    },
    "MonteCarloAEP-temp": {
        "meter": (["MMTR_SupWh"], AT_LEAST_MONTHLY),
        "curtail": (["IAVL_DnWh", "IAVL_ExtPwrDnWh"], AT_LEAST_MONTHLY),
        "reanalysis": (["WMETR_HorWdSpd", "WMETR_AirDen", "WMETR_EnvTmp"], AT_LEAST_MONTHLY),
    },
    "MonteCarloAEP-wd": {
        "meter": (["MMTR_SupWh"], AT_LEAST_MONTHLY),
        "curtail": (["IAVL_DnWh", "IAVL_ExtPwrDnWh"], AT_LEAST_MONTHLY),
        "reanalysis": (
            ["WMETR_HorWdSpd", "WMETR_AirDen", "WMETR_HorWdSpdU", "WMETR_HorWdSpdV"],
            AT_LEAST_MONTHLY,
        ),
    },
    "MonteCarloAEP-temp-wd": {
        "meter": (["MMTR_SupWh"], AT_LEAST_MONTHLY),
        "curtail": (["IAVL_DnWh", "IAVL_ExtPwrDnWh"], AT_LEAST_MONTHLY),
        "reanalysis": (
            ["WMETR_HorWdSpd", "WMETR_AirDen", "WMETR_EnvTmp",
             "WMETR_HorWdSpdU", "WMETR_HorWdSpdV"],
            AT_LEAST_MONTHLY,
        ),
    },
    "TurbineLongTermGrossEnergy": {
        "scada": (["asset_id", "WMET_HorWdSpd", "WTUR_W"], AT_LEAST_DAILY),
        "reanalysis": (["WMETR_HorWdSpd", "WMETR_HorWdDir", "WMETR_AirDen"], AT_LEAST_DAILY),
        "asset": (["rated_power"], None),
    },
    "ElectricalLosses": {
        "scada": (["asset_id", "WTUR_W"], AT_LEAST_DAILY),
        "meter": (["MMTR_SupWh"], AT_LEAST_MONTHLY),
    },
    "WakeLosses-scada": {
        "scada": (["asset_id", "WMET_HorWdSpd", "WTUR_W", "WMET_HorWdDir"], AT_LEAST_HOURLY),
        "reanalysis": (["WMETR_HorWdSpd", "WMETR_HorWdDir"], AT_LEAST_HOURLY),
        "asset": (["latitude", "longitude", "rated_power"], None),
    },
    "WakeLosses-tower": {
        "scada": (["asset_id", "WMET_HorWdSpd", "WTUR_W"], AT_LEAST_HOURLY),
        "tower": (["asset_id", "WMET_HorWdSpd", "WMET_HorWdDir"], AT_LEAST_HOURLY),
        "reanalysis": (["WMETR_HorWdSpd", "WMETR_HorWdDir"], AT_LEAST_HOURLY),
        "asset": (["latitude", "longitude", "rated_power"], None),
    },
    "StaticYawMisalignment": {
        "scada": (
            ["asset_id", "WMET_HorWdSpd", "WTUR_W", "WMET_HorWdDirRel", "WROT_BlPthAngVal"],
            AT_LEAST_HOURLY,
        ),
        "asset": (["rated_power"], None),
    },
}
ALL_ANALYSIS_TYPES = sorted(ANALYSIS_REQUIREMENTS)


def requirements_for(analysis_types: list[str] | None) -> dict[str, tuple[set[str], float | None]]:
    """Union of column requirements and strictest frequency per table
    across the requested analysis types (plant.py:36-145 semantics:
    'all' expands to every registered analysis; None defers)."""
    if not analysis_types:
        return {}
    expanded: list[str] = []
    for t in analysis_types:
        expanded.extend(ALL_ANALYSIS_TYPES if t == "all" else [t])
    merged: dict[str, tuple[set[str], float | None]] = {}
    for t in expanded:
        if t is None:
            continue
        if t not in ANALYSIS_REQUIREMENTS:
            raise ValueError(f"unknown analysis type: {t!r}")
        for table, (cols, freq) in ANALYSIS_REQUIREMENTS[t].items():
            prev_cols, prev_freq = merged.get(table, (set(), None))
            new_freq = (
                freq if prev_freq is None
                else prev_freq if freq is None
                else min(prev_freq, freq)
            )
            merged[table] = (prev_cols | set(cols), new_freq)
    return merged


def create_schema() -> dict:
    """Emit the full canonical schema as a plain dict (JSON-ready);
    analogue of openoa/schema/schema.py:74-120."""
    return {
        table: {
            "columns": dict(cols),
            "units": CANONICAL_UNITS.get(table, {}),
        }
        for table, cols in CANONICAL_DTYPES.items()
    }


def create_analysis_schema(analysis_types: list[str]) -> dict:
    """Schema restricted to the columns an analysis set requires."""
    reqs = requirements_for(analysis_types)
    full = create_schema()
    out: dict = {}
    for table, (cols, freq) in reqs.items():
        out[table] = {
            "columns": {c: full[table]["columns"][c] for c in sorted(cols)},
            "min_frequency_seconds": freq,
        }
    return out
