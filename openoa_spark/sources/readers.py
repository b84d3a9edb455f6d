"""Schema-checked ingestion.

Parity targets (behavior only): openoa/plant.py:271-331 (load_to_pandas
+ rename), plant.py:217-267 (column/dtype validation). The Spark
formulation validates lazily and cheaply: column presence is a metadata
check, dtype coercion is ``cast`` in the projection (pushed to the
scan), and failure counting is one aggregate of ``try_cast`` nulls —
never row-by-row mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    col_map: dict[str, str] | None = None,
    **options,
) -> DataFrame:
    """Read a table; optionally rename user columns → canonical names
    (col_map, reference plant.py:314-331) and cast to a declared
    schema. Both are projections Catalyst folds into the scan."""
    reader = spark.read.options(**options)
    if fmt == "csv":
        reader = reader.option("header", "true")
        df = reader.schema(schema).csv(path) if schema else reader.option("inferSchema", "true").csv(path)
    else:
        df = reader.format(fmt).load(path)
    if col_map:
        df = df.select(
            *[F.col(u).alias(c) for u, c in col_map.items()],
            *[F.col(c) for c in df.columns if c not in col_map],
        )
    if schema and fmt != "csv":
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return df


def validate_columns(df: DataFrame, required: list[str]) -> list[str]:
    """Missing-column check (plant.py:217-237): metadata only."""
    return [c for c in required if c not in df.columns]


def cast_failure_counts(df: DataFrame, casts: dict[str, str]) -> dict[str, int]:
    """Per-column count of values that fail a cast (plant.py:240-267):
    one aggregate pass with try_cast."""
    aggs = [
        F.count(
            F.when(F.col(c).isNotNull() & F.try_cast(F.col(c), t).isNull(), 1)
        ).alias(c)
        for c, t in casts.items()
    ]
    row = df.agg(*aggs).first()
    return {c: int(row[c]) for c in casts}


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's TPC-H-ish test tables and register temp views."""
    out = {}
    for name in TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
