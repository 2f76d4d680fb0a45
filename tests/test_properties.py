"""Property-based tests (hypothesis) for the engine's core invariants.

Fast, driver-side generation → tiny DataFrames; each property pins a
semantics contract that must hold for ANY input, not just the fixtures:
decimal-exact sums, LWW dedup laws, shingle/Jaccard bounds, salting
equivalence.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hybrid_nutrition_data_pipeline_batch_streaming_spark.functions.parity import (
    MONEY,
    dsum,
)
from hybrid_nutrition_data_pipeline_batch_streaming_spark.operators.skew import (
    salted_join,
)
from hybrid_nutrition_data_pipeline_batch_streaming_spark.pipeline import (
    dedup_last_write_wins,
)

FAST = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

money = st.decimals(
    min_value=Decimal("-9999.99"),
    max_value=Decimal("9999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@FAST
@given(vals=st.lists(money, min_size=1, max_size=50))
def test_dsum_equals_exact_decimal_sum(spark, vals):
    """dsum must equal the exact (Python Decimal) sum for any partitioning."""
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(4)
    got = df.agg(dsum(F.col("x")).alias("s")).collect()[0].s
    # Engine casts each double to DECIMAL(12,2) first — mirror that exactly.
    expected = float(sum(Decimal(str(round(float(v), 2))) for v in vals))
    assert got == expected


@FAST
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10_000),
            st.text(alphabet="xyz", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lww_dedup_laws(spark, rows):
    """One row per key; the kept row carries that key's max timestamp;
    applying dedup twice equals applying it once (idempotence)."""
    base = datetime.datetime(2024, 1, 1)
    data = [
        (k, base + datetime.timedelta(seconds=s), payload) for k, s, payload in rows
    ]
    df = spark.createDataFrame(
        data, "item_name string, ingestion_ts timestamp_ntz, payload string"
    )
    out = dedup_last_write_wins(df).collect()
    keys = [r.item_name for r in out]
    assert len(keys) == len(set(keys)) == len({k for k, _, _ in rows})
    max_ts = {}
    for k, s, _ in rows:
        max_ts[k] = max(max_ts.get(k, -1), s)
    for r in out:
        assert r.ingestion_ts == base + datetime.timedelta(seconds=max_ts[r.item_name])
    again = dedup_last_write_wins(dedup_last_write_wins(df)).count()
    assert again == len(set(keys))


@FAST
@given(
    big_keys=st.lists(st.integers(0, 5), min_size=1, max_size=40),
    small_keys=st.sets(st.integers(0, 5), min_size=1, max_size=6),
)
def test_salted_join_property(spark, big_keys, small_keys):
    """salted_join ≡ plain join for arbitrary (skewed) key multisets."""
    big = spark.createDataFrame([(k, i) for i, k in enumerate(big_keys)], "k int, v int")
    small = spark.createDataFrame([(k, f"s{k}") for k in small_keys], "k int, tag string")
    plain = sorted(tuple(r) for r in big.join(small, "k").collect())
    salted = sorted(
        tuple(r) for r in salted_join(big, small, "k", n_salts=3).select("k", "v", "tag").collect()
    )
    assert plain == salted
