"""sf1-scale end-to-end exercise (round 9): run three REAL pipelines
once at the next data decade above the bench SF and record wall-clock
plus peak JVM heap, so the next sim_batch-class memory boundary is
found here rather than by a user.

Scale construction: tools/scale_probe.build_probe_dir inflates sf0.1
by ``factor`` (default 13 — lineitem ~7.8M rows ≈ TPC-H sf1.3, docs
65k, events span 390 days so the AEP daily calendar-coverage check
(365 distinct (month, day) pairs) is satisfiable end-to-end).

Legs:
  1. curate_corpus — the full curation chain (gopher rules + exact
     dedup + banded-LSH near dedup) with the per-stage ledger on.
  2. near_dedup_docs — the standalone registry near-dup pipeline,
     materialized via the noop sink.
  3. MonteCarloAEP — plant synthesized from the inflated events table
     (the scale_probe aep-prep construction), full prepare() + 100
     distributed Monte-Carlo sims.

Peak heap is sampled from the live JVM (Runtime used memory, 0.5 s
poll) — the same number the auto_sim_batch budget reasons about.

Usage: python tools/sf1_exercise.py [factor]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from openoa_spark import registry  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402
from tools.scale_probe import build_probe_dir  # noqa: E402


class HeapPoller(threading.Thread):
    def __init__(self, spark, interval=0.5):
        super().__init__(daemon=True)
        self._rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        self.interval = interval
        self.peak_used = 0
        self.max_heap = int(self._rt.maxMemory())
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            try:
                used = int(self._rt.totalMemory()) - int(self._rt.freeMemory())
                self.peak_used = max(self.peak_used, used)
            except Exception:  # noqa: BLE001 — gateway teardown race
                return
            time.sleep(self.interval)

    def stop(self):
        self._stop.set()


def leg_curate(spark, d):
    import warnings

    from openoa_spark.datapipe.pipeline import CurationConfig, curate_corpus

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    # First: DEFAULT config (gopher rules ON). The synthetic corpus
    # contains no English stopwords, so the required-stopword gate
    # empties it at any scale — since r10 the ledger must REPORT that
    # wipe-out loudly (zero-survivor guard) instead of this tool
    # silently configuring around it (r9 verdict item 5).
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _, gopher_ledger = curate_corpus(
            docs, CurationConfig(near_dedup=False), report=True
        )
    wipeout = [str(c.message) for c in caught
               if issubclass(c.category, RuntimeWarning)
               and "curate_corpus" in str(c.message)]
    # Then the measured leg: gopher OFF so the dedup stages see data.
    t0 = time.perf_counter()
    cfg = CurationConfig(gopher_rules=False)
    clean, ledger = curate_corpus(docs, cfg, report=True)
    n = clean.count()
    return {"wall_s": round(time.perf_counter() - t0, 2),
            "survivors": n, "ledger": ledger,
            "gopher_default_ledger": gopher_ledger,
            "gopher_wipeout_warning": (wipeout[0][:220] if wipeout
                                       else "MISSING — guard regressed")}


def leg_near_dedup(spark, d):
    q = registry.queries()["near_dedup_docs"]
    t0 = time.perf_counter()
    q(spark, d).write.format("noop").mode("overwrite").save()
    return {"wall_s": round(time.perf_counter() - t0, 2)}


def leg_aep(spark, d, num_sim=100):
    """Plant from the inflated events table (the scale_probe aep-prep
    construction) run END-TO-END: prepare() + distributed MC."""
    from openoa_spark.analysis.aep import MonteCarloAEP
    from openoa_spark.plant import PlantData

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
    start = ev.agg(F.min("ts")).first()[0]
    n_back = 24 * 400
    backfill = spark.range(n_back).select(
        F.timestamp_micros(
            F.lit(int(start.timestamp() * 1e6))
            - (F.col("id") + 1) * F.lit(3_600_000_000)
        ).alias("time"),
        (F.lit(5.0) + (F.col("id") % 7).cast("double")).alias("WMETR_HorWdSpd"),
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
    mc = MonteCarloAEP(plant, time_resolution="D", uncertainty_windiness=(1, 1))
    t0 = time.perf_counter()
    mc.prepare()
    t1 = time.perf_counter()
    res = mc.run(num_sim=num_sim, distributed=True)
    t2 = time.perf_counter()
    return {"prepare_s": round(t1 - t0, 2), "run_s": round(t2 - t1, 2),
            "num_sim": num_sim,
            "aep_gwh_mean": round(res.aep_mean, 3)}


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    spark = get_session("sf1-exercise")
    d = os.path.join("spark-warehouse", "sf1_exercise")
    t0 = time.perf_counter()
    build_probe_dir(spark, "/root/testdata/sf0.1", factor, d)
    build_s = round(time.perf_counter() - t0, 2)
    poller = HeapPoller(spark)
    poller.start()
    out = {"factor": factor, "base": "sf0.1", "build_s": build_s}
    for leg, fn in (("curate", leg_curate), ("near_dedup", leg_near_dedup),
                    ("aep", leg_aep)):
        out[leg] = fn(spark, d)
        print(f"# {leg}: {json.dumps(out[leg])}", file=sys.stderr, flush=True)
    poller.stop()
    out["peak_heap_gib"] = round(poller.peak_used / (1 << 30), 2)
    out["max_heap_gib"] = round(poller.max_heap / (1 << 30), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
