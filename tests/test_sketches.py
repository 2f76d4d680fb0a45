"""Contract tests for the mergeable-sketch suite (plans/sketches.py).

Parity vs DuckDB is covered by tests/test_oracle_parity.py; these pin the
sketch-theoretic guarantees the oracle comparison alone cannot express:
KMV's bounded relative error, count-min's overestimate-only property,
Bloom's no-false-negative property, and the pow-2 bucket invariant.
"""

from __future__ import annotations

from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans
from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans import sketches


def test_kmv_estimate_within_bounds(spark, sf_dir):
    row = plans.QUERIES["agg_kmv_distinct"](spark, sf_dir).collect()[0]
    assert row.k_used == sketches.KMV_K
    assert row.kth_hash > 0
    # KMV with k=64 has ~1/sqrt(k) ≈ 12.5% relative std error; 50% is a
    # loose-but-meaningful regression floor.
    assert abs(row.est_distinct - row.exact_distinct) <= 0.5 * row.exact_distinct


def test_countmin_never_underestimates(spark, sf_dir):
    rows = plans.QUERIES["sketch_countmin"](spark, sf_dir).collect()
    assert len(rows) == sketches.CM_PROBES
    for r in rows:
        assert r.cm_estimate >= r.true_count, r


def test_bloom_has_no_false_negatives(spark, sf_dir):
    row = plans.QUERIES["sketch_bloom"](spark, sf_dir).collect()[0]
    assert row.n_probes >= row.n_members > 0
    # every true member must probe positive...
    assert row.n_bloom_positive - row.n_false_positive == row.n_members
    # ...and at 65536 bits / ~34 keys the fp count stays small.
    assert row.n_false_positive <= row.n_probes // 10


def test_length_buckets_are_pow2_and_cover_all_docs(spark, sf_dir):
    rows = plans.QUERIES["length_bucketize"](spark, sf_dir).collect()
    n_docs_total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_docs_total == docs
    for r in rows:
        assert r.bucket & (r.bucket - 1) == 0 and r.bucket >= 1
        assert 0 <= r.sum_tokens <= r.padded_tokens == r.bucket * r.n_docs
        assert 0 <= r.waste_ppm < 1_000_000
