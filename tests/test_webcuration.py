"""Web-curation suite: plan-shape pins + signal checks.

The oracle parity harness proves the values; these tests pin the physical
properties that make the suite viable on a real crawl — map-only URL
parsing, one shared exchange for the domain-cap window+audit, and that the
deterministic fixtures actually exercise the interesting branches (variants
collapse, caps bind, corruption is detected, later snapshots contain
non-novel keys).
"""

from __future__ import annotations

import re

from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    df = plans.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_parse_funcs_is_map_only(spark):
    plan = _plan(spark, "url_parse_funcs")
    assert len(re.findall(r"\bExchange\b", plan)) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mojibake_score_is_map_only(spark):
    plan = _plan(spark, "mojibake_score")
    assert len(re.findall(r"\bExchange\b", plan)) == 0


def test_url_canonical_dedup_single_partial_agg_shuffle(spark):
    plan = _plan(spark, "url_canonical_dedup")
    # Variants collapse map-side (partial agg) and cross the wire once.
    assert len(re.findall(r"\bExchange\b", plan)) == 1
    assert plan.count("HashAggregate") == 2


def test_url_domain_caps_window_and_audit_share_one_exchange(spark):
    # The row_number window partitions by domain and the audit aggregate
    # groups by domain — Spark must reuse that partitioning, not re-shuffle.
    plan = _plan(spark, "url_domain_caps")
    assert len(re.findall(r"\bExchange\b", plan)) == 1


def test_url_canonical_dedup_collapses_variants(spark):
    rows = plans.QUERIES["url_canonical_dedup"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_variants for r in rows) == n_docs  # every doc accounted for
    assert any(r.n_variants > 1 for r in rows)  # variants really collapse


def test_domain_caps_bind_at_scale(spark):
    # At sf0.01 every domain exceeds the cap — the quota branch must fire.
    rows = plans.QUERIES["url_domain_caps"](spark, "/root/testdata/sf0.01").collect()
    assert sum(r.n_dropped for r in rows) > 0
    assert all(r.n_kept <= 10 for r in rows)
    assert all(r.n_kept + r.n_dropped == r.n_docs for r in rows)


def test_mojibake_detects_injected_corruption(spark):
    rows = plans.QUERIES["mojibake_score"](spark, SF).collect()
    flagged = [r for r in rows if not r.keep]
    assert flagged and all(r.n_bad > 0 and r.bad_ppm > 0 for r in flagged)
    clean = [r for r in rows if r.keep]
    assert clean and all(r.n_bad == 0 for r in clean)


def test_snapshot_novelty_declines(spark):
    # With first-seen-wins, a later snapshot must contain at least one
    # already-seen key at sf0.01 (the fingerprint is built to collide).
    rows = plans.QUERIES["dedup_snapshots"](spark, "/root/testdata/sf0.01").collect()
    assert sum(r.n_docs for r in rows) == 500
    assert any(r.n_new_keys < r.n_keys for r in rows if r.snap_no > 0)
    # Snapshot 0 has no earlier snapshot: everything it holds is novel.
    first = next(r for r in rows if r.snap_no == 0)
    assert first.n_new_keys == first.n_keys
