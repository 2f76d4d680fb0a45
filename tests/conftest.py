"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set BEFORE the plans package imports: the file_provenance oracle
# bakes the fixture path into its SQL (DuckDB's filename pseudo-column needs
# read_parquet, not the pre-registered views), defaulting to the driver's
# sf0.01; the local harness compares at sf0.001 unless overridden.
os.environ.setdefault("TEST_ORACLE_SF_DIR", "/root/testdata/sf0.001")

from hybrid_nutrition_data_pipeline_batch_streaming_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("TEST_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hybrid-nutrition-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
