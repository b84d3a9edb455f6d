"""Column-expression library: the scalar/aggregate functions of the
reference's ``openoa/utils`` re-expressed as Catalyst expressions
(JVM-side, whole-stage-codegen'd — never row-at-a-time Python)."""

from openoa_spark.functions.stats import dsum, davg, rounded  # noqa: F401
from openoa_spark.functions import met, units  # noqa: F401
