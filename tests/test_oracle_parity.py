"""Differential check: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 gate (row-count + column set + order-insensitive
EXACT value comparison, columns sorted by name) so oracle drift is caught
here first. Exact equality — including doubles — is intentional: the engine's
parity discipline (decimal-exact aggregation, left-fold array sums,
NTZ timestamps) is designed to make Spark and DuckDB bit-identical.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans
from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import TABLES

SF_DIR = os.environ.get("TEST_ORACLE_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(plans.ORACLE)
ROWS_ONLY_QUERIES = sorted(set(plans.QUERIES) - set(plans.ORACLE))


def _norm(v):
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("null",)
    try:  # Decimal → exact string
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", repr(float(v)))
    except Exception:
        pass
    return ("s", str(v))


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, duck):
    sdf = plans.QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = sdf.collect()

    rel = duck.sql(plans.ORACLE[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    left = _normalize([tuple(r) for r in spark_rows], spark_cols)
    right = _normalize(duck_rows, duck_cols)
    mismatches = [
        (l, r) for l, r in zip(left, right) if l != r
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark):
    sdf = plans.QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
