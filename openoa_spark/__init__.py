"""openoa_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NREL/OpenOA (reference: /root/reference,
OpenOA v3.1.3), re-architected Spark-first.

The reference is a serial pandas library of wind-plant operators and
Monte-Carlo analysis pipelines. This package re-expresses the same
semantics as lazy Spark DataFrame transformations so the same queries
run unchanged from a laptop (local[*]) to a 1000-executor cluster on
100 TB of telemetry:

- ``openoa_spark.functions`` — scalar/aggregate Column expression
  library (met-data math, unit conversion, numerically-exact helpers).
- ``openoa_spark.operators`` — DataFrame operators (time-series
  resampling, gap/duplicate detection, flagging filters, imputation,
  power-curve, plant geometry).
- ``openoa_spark.plans`` — the PlantData model: schema registry,
  column mapping, validation.
- ``openoa_spark.analysis`` — the composite analysis pipelines
  (electrical losses, Monte-Carlo AEP, ...), with Spark-parallelized
  Monte Carlo.
- ``openoa_spark.datapipe`` — large-scale training-data pipeline
  operators (dedup, similarity search, text analysis, multimodal).
- ``openoa_spark.streaming`` — Structured Streaming ingestion mapping
  the batch resample semantics onto event-time windows.
"""

__version__ = "0.1.0"

from openoa_spark.session import get_session  # noqa: F401
