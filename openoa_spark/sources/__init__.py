"""Sources/sinks: schema-checked parquet/CSV readers and writers."""

from openoa_spark.sources.readers import read_table, load_testdata  # noqa: F401
