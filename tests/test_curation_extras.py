"""Contract tests for the round-3 curation additions (plans/curation.py):
consecutive-duplicate-token cleanup and temperature-based language sampling.
DuckDB parity is covered by tests/test_oracle_parity.py."""

from __future__ import annotations

from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans


def test_clean_repeated_tokens_removes_all_stutter(spark, sf_dir):
    rows = plans.QUERIES["clean_repeated_tokens"](spark, sf_dir).collect()
    assert rows
    cleaned_any = False
    for r in rows:
        assert 0 <= r.n_after <= r.n_before
        toks = r.clean_text.split(" ") if r.clean_text else []
        assert len(toks) == r.n_after
        # the defining property: no consecutive duplicates survive
        assert all(a != b for a, b in zip(toks, toks[1:]))
        cleaned_any = cleaned_any or r.n_after < r.n_before
    assert cleaned_any, "fixture should contain at least one stutter run"


def test_clean_repeated_tokens_is_ansi_safe(spark, sf_dir):
    """The index-0 lambda guard must not raise under ANSI mode (the driver
    runs a vanilla ANSI-on session; try_element_at keeps position 0 NULL)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        n = plans.QUERIES["clean_repeated_tokens"](spark, sf_dir).count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_temperature_sample_flattens_toward_smallest_language(spark, sf_dir):
    rows = plans.QUERIES["corpus_temperature_sample"](spark, sf_dir).collect()
    assert len(rows) >= 2
    n_min = min(r.n_docs for r in rows)
    for r in rows:
        assert 0 < r.n_sampled <= r.n_docs
        # expected kept fraction is sqrt(n_min/n_docs); allow generous
        # binomial slack but pin the flattening direction for the biggest gap
        if r.n_docs == n_min:
            assert r.n_sampled >= 0.9 * r.n_docs
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs > 2 * small.n_docs:
        assert big.n_sampled / big.n_docs < small.n_sampled / small.n_docs
