"""Pipeline-parity unit tests (SURVEY.md §5.2 items 3–4): reference-shaped
fixtures (FIXTURES.md B2/B3) through the batch pipeline, exact golden output.

Covers the edge semantics the DuckDB oracle can hide: null vs '[]' vs
malformed data, missing-field 0-defaults, multi-element arrays, LWW dedup
tie-breaking, and the deterministic enrichment strings.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hybrid_nutrition_data_pipeline_batch_streaming_spark.pipeline import (
    ENRICHED_COLUMNS,
    dedup_last_write_wins,
    filter_valid_raw,
    flatten_nutrition,
    run_batch_pipeline,
)

TS1 = datetime.datetime(2024, 1, 15, 12, 0, 0)
TS2 = datetime.datetime(2024, 1, 15, 13, 0, 0)

GOOD_JSON = (
    '[{"name": "avocado toast", "calories": 245.1, "serving_size_g": 100.0,'
    ' "fat_total_g": 14.2, "fat_saturated_g": 2.9, "protein_g": 6.1,'
    ' "sodium_mg": 320.0, "potassium_mg": 450.0, "cholesterol_mg": 0.0,'
    ' "carbohydrates_total_g": 23.4, "fiber_g": 6.7, "sugar_g": 1.2}]'
)
MISSING_FIELDS_JSON = '[{"name": "plain rice", "calories": 130.0}]'
MULTI_ELEMENT_JSON = (
    '[{"name": "first", "calories": 10.0}, {"name": "second", "calories": 999.0}]'
)


@pytest.fixture()
def raw(spark):
    rows = [
        ("avocado toast", TS1, GOOD_JSON),
        ("plain rice", TS1, MISSING_FIELDS_JSON),
        ("multi", TS1, MULTI_ELEMENT_JSON),
        ("processed", TS1, "[]"),          # processed marker → dropped
        ("broken", TS1, '[{"cal'),          # malformed → dropped
        ("missing", TS1, None),             # null → dropped
        ("dup item", TS1, '[{"name": "dup", "calories": 1.0}]'),
        ("dup item", TS2, '[{"name": "dup", "calories": 2.0}]'),  # LWW winner
    ]
    return spark.createDataFrame(rows, "item_name string, ingestion_ts timestamp_ntz, data string")


def test_filter_valid_raw_drops_bad_rows(raw):
    kept = {r.item_name for r in filter_valid_raw(raw).collect()}
    assert kept == {"avocado toast", "plain rice", "multi", "dup item"}


def test_flatten_defaults_and_first_element(raw):
    flat = {r["item_name"]: r.asDict() for r in flatten_nutrition(filter_valid_raw(raw)).collect()}
    # full payload flattens intact, `name` column is dropped
    assert flat["avocado toast"]["calories"] == 245.1
    assert flat["avocado toast"]["sugar_g"] == 1.2
    assert "name" not in flat["avocado toast"]
    # missing fields default to 0.0 (reference float(rec.get(k, 0)))
    assert flat["plain rice"]["calories"] == 130.0
    assert flat["plain rice"]["fat_total_g"] == 0.0
    assert flat["plain rice"]["sugar_g"] == 0.0
    # only element [0] of a multi-element array is used
    assert flat["multi"]["calories"] == 10.0


def test_lww_dedup_keeps_latest(raw):
    out = run_batch_pipeline(raw)
    dup = [r for r in out.collect() if r.item_name == "dup item"]
    assert len(dup) == 1
    assert dup[0].calories == 2.0
    assert dup[0].ingestion_ts == TS2


def test_enriched_schema_and_strings(raw):
    out = run_batch_pipeline(raw)
    assert tuple(out.columns) == ENRICHED_COLUMNS
    row = next(r for r in out.collect() if r.item_name == "avocado toast")
    assert row.openai_description == (
        "Description: avocado toast has 245.1 kcal per serving."
    )
    assert row.openai_best_pairings == "Best pairings for avocado toast: water."
    assert row.openai_health_impact == "Health impact of avocado toast: light."
    assert row.openai_preparation_tips == (
        "Preparation tips for avocado toast: serve fresh."
    )


def test_dedup_lww_tiebreak_is_deterministic(spark):
    # Same key, same ts — the dedup must still return exactly one row.
    df = spark.createDataFrame(
        [("k", TS1, "a"), ("k", TS1, "b")],
        "item_name string, ingestion_ts timestamp_ntz, payload string",
    )
    assert dedup_last_write_wins(df).count() == 1


def test_write_clustered_roundtrip(spark, raw, tmp_path):
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.pipeline import (
        write_clustered,
    )

    out = run_batch_pipeline(raw)
    path = str(tmp_path / "enriched")
    write_clustered(out, path, n_files=2)
    back = spark.read.parquet(path)
    assert back.count() == out.count()
    assert set(back.columns) == set(ENRICHED_COLUMNS)
    # Clustering invariant: rows inside each file are sorted by the key
    # (MergeTree ORDER BY analog, FIXTURES.md B5).
    files = back.select(F.input_file_name().alias("f"), "item_name").collect()
    by_file: dict[str, list[str]] = {}
    for r in files:
        by_file.setdefault(r.f, []).append(r.item_name)
    for names in by_file.values():
        assert names == sorted(names)


def test_incremental_pipeline_two_waves(spark, tmp_path):
    """The scheduled-job replacement (S6/T5): two raw arrival waves, two
    runs; the final enriched table equals the one-shot batch pipeline over
    all raw data (exactly-once increments + LWW merge)."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.pipeline import (
        run_incremental_pipeline,
    )

    raw_dir = str(tmp_path / "raw")
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")
    schema = "item_name string, ingestion_ts timestamp_ntz, data string"

    wave1 = [
        ("avocado toast", TS1, GOOD_JSON),
        ("plain rice", TS1, MISSING_FIELDS_JSON),
        ("dup item", TS1, '[{"name": "dup", "calories": 1.0}]'),
    ]
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode("append").parquet(raw_dir)
    first = run_incremental_pipeline(spark, raw_dir, out, ckpt)
    assert {r.item_name for r in first.collect()} == {
        "avocado toast", "plain rice", "dup item",
    }

    wave2 = [
        ("dup item", TS2, '[{"name": "dup", "calories": 2.0}]'),  # LWW update
        ("multi", TS1, MULTI_ELEMENT_JSON),
        ("broken", TS1, "[{oops"),  # dropped
    ]
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode("append").parquet(raw_dir)
    final = run_incremental_pipeline(spark, raw_dir, out, ckpt)

    all_raw = spark.createDataFrame(wave1 + wave2, schema)
    expected = run_batch_pipeline(all_raw)
    got = {tuple(r) for r in final.select(*ENRICHED_COLUMNS).collect()}
    exp = {tuple(r) for r in expected.collect()}
    assert got == exp


def test_observed_quality_counters_match_direct_aggregates(raw):
    """Observation-API counters must equal a direct audit of the same frame
    — collected as a side effect of the ONE production action, no second
    scan of the input."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.functions.observability import (
        observe_nutrition_quality,
    )

    flat = flatten_nutrition(filter_valid_raw(raw))
    instrumented, obs = observe_nutrition_quality(flat)
    rows = instrumented.collect()  # the production action
    got = obs.get

    expected = {
        "rows": len(rows),
        "null_or_zero_calories": sum(
            1 for r in rows if r.calories is None or r.calories == 0.0
        ),
        "negative_macros": sum(
            1
            for r in rows
            if (r.protein_g or 0) < 0
            or (r.fat_total_g or 0) < 0
            or (r.carbohydrates_total_g or 0) < 0
        ),
        "bad_serving_size": sum(
            1 for r in rows if r.serving_size_g is None or r.serving_size_g <= 0
        ),
    }
    assert got == expected
    assert got["rows"] > 0  # the fixture's valid rows actually flowed


def test_incremental_corpus_snapshot_pipeline(spark, tmp_path):
    """The rolling corpus build, end to end: a curated snapshot lives in the
    keyed store; each arriving batch is deduped AGAINST THE SNAPSHOT (banded
    minhash probe — index-side work only for touched band buckets), the
    accepted docs merge in as a new version, and the change feed maintains a
    downstream token-count aggregate incrementally — landing exactly on the
    full recompute. This is the composition the per-operator queries
    (dedup_incremental, upsert store, CDF/IVM) exist for."""
    from pyspark.sql import functions as F

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.dedup import (
        N_MINHASHES,
        _minhash,
        _shingles,
    )
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.upsert_sink import (
        ParquetUpsertStore,
    )

    def sig(df):
        return (
            df.select("doc_id", "text", _shingles(F.col("text")).alias("sh"))
            .withColumn("dg", F.transform(F.col("sh"), F.md5))
            .select(
                "doc_id",
                "text",
                "sh",
                *[_minhash(F.col("dg"), k).alias(f"mh{k}") for k in range(N_MINHASHES)],
            )
        )

    store = ParquetUpsertStore(
        spark, str(tmp_path / "corpus"), key="doc_id", ts_col="ingested_at", n_buckets=4
    )
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    snapshot = spark.createDataFrame(
        [(i, f"{base} doc{i} " + base, 1.0) for i in range(10)],
        "doc_id bigint, text string, ingested_at double",
    )
    store.merge(snapshot)
    v1 = store.history()[-1]

    # batch B: 2 near-dups of snapshot docs (one-token edits) + 2 fresh docs
    batch = spark.createDataFrame(
        [
            (100, f"{base} doc0 " + base.replace("kappa", "lambda"), 2.0),  # ~dup of 0
            (101, f"{base} doc3 " + base.replace("alpha", "omega"), 2.0),   # ~dup of 3
            (102, "completely different words entirely novel content here", 2.0),
            (103, "another unrelated fresh document with new tokens only", 2.0),
        ],
        "doc_id bigint, text string, ingested_at double",
    )

    # probe: banded candidates new×snapshot, exact-Jaccard verify
    seen = sig(store.read())
    new = sig(batch)
    cand = None
    for cols in (("mh0", "mh1"), ("mh2", "mh3")):
        n, s = new.alias("n"), seen.alias("s")
        cond = (F.col(f"n.{cols[0]}") == F.col(f"s.{cols[0]}")) & (
            F.col(f"n.{cols[1]}") == F.col(f"s.{cols[1]}")
        )
        piece = n.join(s, cond).select(
            F.col("n.doc_id").alias("new_id"),
            F.col("n.sh").alias("sh_n"),
            F.col("s.sh").alias("sh_s"),
        )
        cand = piece if cand is None else cand.unionByName(piece)
    jac = F.size(F.array_intersect("sh_n", "sh_s")).cast("double") / F.size(
        F.array_union("sh_n", "sh_s")
    )
    dup_ids = {
        r.new_id
        for r in cand.where(jac >= 0.5).select("new_id").distinct().collect()
    }
    assert dup_ids == {100, 101}  # the probe catches exactly the near-dups

    accepted = batch.where(~F.col("doc_id").isin(list(dup_ids)))
    store.merge(accepted)
    v2 = store.history()[-1]
    assert {r.doc_id for r in store.read().collect()} == set(range(10)) | {102, 103}

    # CDF-driven incremental maintenance of a token-count aggregate
    def token_counts(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("t"))
            .where(F.col("t") != "")
            .groupBy("t")
            .agg(F.count("*").alias("c"))
        )

    maintained = {r.t: r.c for r in token_counts(store.read(version=v1)).collect()}
    cdf = store.changes(v1, v2)
    assert {r.change_type for r in cdf.collect()} == {"insert"}
    for r in token_counts(cdf.where(F.col("change_type") == "insert")).collect():
        maintained[r.t] = maintained.get(r.t, 0) + r.c
    full = {r.t: r.c for r in token_counts(store.read()).collect()}
    assert maintained == full
