"""Degenerate-input guard: every registry query must run (not crash)
against schema-only (zero-row) versions of all tables. The classic
failure mode is a driver-side scalar fit collecting None from an empty
aggregate — caught here for the impute queries once already."""

import os
import shutil

import pytest

from openoa_spark import registry
from openoa_spark.sources.readers import TESTDATA_TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TESTDATA_TABLES:
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).limit(0) \
            .write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_every_query_survives_empty_tables(spark, empty_dir):
    failures = []
    for name, fn in registry.queries().items():
        try:
            fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e).splitlines()[0][:100]}")
    assert not failures, failures
