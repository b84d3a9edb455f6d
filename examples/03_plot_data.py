"""Plot-data walkthrough — the engine-side halves of the reference's
chart surface (see PLOTTING.md for the full function-by-function map).

Every builder reduces a (possibly huge) Spark input to a chart-grain
pandas frame; rendering is whatever stack you like (matplotlib is not
installed here, so this example prints the frames).

Run: python examples/03_plot_data.py [sf_dir]   (~1 min on local[*])
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from openoa_spark import plots  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402
from windfixtures import make_asset, make_scada  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    spark = get_session("plot-data-example")

    print("== windfarm map marks (plot_windfarm) ==")
    asset = spark.createDataFrame(make_asset())
    print(plots.windfarm_plot_data(asset).to_string(index=False))

    print("\n== power curve: hash-capped scatter + IEC curve ==")
    scada = spark.createDataFrame(make_scada(days=10))
    pc = plots.power_curve_plot_data(
        scada, "WMET_HorWdSpd", "WTUR_W", max_points=500
    )
    print(f"scatter marks: {len(pc['scatter'])} (deterministic sample)")
    print(pc["curve"].head(8).to_string(index=False))

    print("\n== column histograms over the documents table ==")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    hist = plots.column_histograms_data(docs, ["n_chars"], bins=12)
    print(hist.to_string(index=False))

    print("\n== EYA gap waterfall geometry ==")
    wf = plots.waterfall_plot_data(
        [32.5, -1.2, 0.8, -0.6, 31.5],
        ["EYA AEP", "TIE gap", "elec gap", "avail gap", "OA AEP"],
    )
    print(wf.to_string(index=False))

    print("\n== MC distribution bins + box stats ==")
    import numpy as np

    samples = np.random.default_rng(42).normal(34.1, 0.2, 300)
    print(plots.distribution_plot_data(samples, n_bins=10).to_string(index=False))
    print(plots.boxplot_stats(samples))


if __name__ == "__main__":
    main()
