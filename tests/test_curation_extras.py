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


def test_dedup_lines_reassembly_invariants(spark, sf_dir):
    """Chunk-dedup contract: a doc that lost nothing reassembles to its
    EXACT original text; a doc that lost chunks keeps only whole surviving
    chunks, in original order (its clean_text tokens are a subsequence of
    the original tokens); and the fixture must exercise both paths."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = plans.QUERIES["dedup_lines"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    dropped_any = False
    for r in rows:
        orig = docs[r.doc_id]
        if r.n_dropped == 0:
            assert r.clean_text == orig
        else:
            dropped_any = True
            ot, ct = orig.split(" "), r.clean_text.split(" ") if r.clean_text else []
            # subsequence check
            it = iter(ot)
            assert all(tok in it for tok in ct)
            assert len(ct) < len(ot)
    assert dropped_any, "fixture should contain cross-doc duplicate chunks"


def test_shard_balanced_shards_are_contiguous_and_bounded(spark, sf_dir):
    """Sharding contract: every doc is assigned; shard ids are the dense
    range 0..max; each shard's token load is < budget + its largest doc
    (the overshoot bound of start-offset assignment); and all shards
    except the last carry at least a full budget's worth of starts."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.corpus import (
        SHARD_TOKEN_BUDGET,
    )

    rows = plans.QUERIES["shard_balanced"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.n_tokens)
    ids = sorted(by_shard)
    assert ids == list(range(len(ids))), "shard ids must be dense from 0"
    total = sum(sum(v) for v in by_shard.values())
    assert total == sum(r.n_tokens for r in rows)
    for sid in ids:
        load = sum(by_shard[sid])
        assert load < SHARD_TOKEN_BUDGET + max(by_shard[sid])
    # every non-final shard is full up to the budget boundary
    for sid in ids[:-1]:
        assert sum(by_shard[sid]) + max(by_shard[sid + 1]) > SHARD_TOKEN_BUDGET
