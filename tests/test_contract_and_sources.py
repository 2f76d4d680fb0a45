"""Driver-contract smoke + source-reader tests."""

from __future__ import annotations

import json

import pytest


def test_driver_contract_shape(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c_mktsegment", "order_cnt", "revenue"]

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs), "oracle keys must be registered queries"
    assert len(qs) >= 50
    # Every callable takes (spark, sf_dir).
    sample = qs["scan_project"](spark, "/root/testdata/sf0.001")
    assert sample.count() > 0


def test_json_lines_permissive_quarantine(spark, tmp_path):
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.sources.readers import (
        read_json_lines,
    )

    p = tmp_path / "raw.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"item_name": "a", "calories": 1.5}),
                '{"item_name": "broken"',  # malformed → quarantined
                json.dumps({"item_name": "b", "calories": 2.5}),
            ]
        )
    )
    df = read_json_lines(
        spark,
        str(p),
        schema="item_name string, calories double, _corrupt_record string",
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.item_name for r in good} == {"a", "b"}
    assert len(bad) == 1 and bad[0]._corrupt_record.startswith('{"item_name"')


def test_read_parquet_prunes_columns(spark):
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.sources.readers import (
        read_parquet,
    )

    df = read_parquet(
        spark, "/root/testdata/sf0.001/orders.parquet", ["o_orderkey", "o_totalprice"]
    )
    assert df.columns == ["o_orderkey", "o_totalprice"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o_orderpriority" not in plan
