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


def test_planted_neardup_recall_against_ground_truth(spark, tmp_path):
    """Ground-truth dedup evaluation (not parity — MEASUREMENT): the scale
    generator plants one-token-edit near-duplicate pairs at known ids
    (doc_id % 20 == 7 duplicates doc_id−1), so recall/precision of the
    banded-MinHash detector are computable against the actual answer key.
    The planted edit distance is tiny (1 token in 15-74), so the detector
    must find most of them; any pair it reports must be genuinely similar
    (verified-Jaccard stage guarantees ≥ 0.5 by construction — precision
    here checks the GROUND-TRUTH label, a stronger claim)."""
    import sys

    sys.path.insert(0, "tools")
    from make_scale_data import gen_documents

    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

    out = str(tmp_path / "planted")
    gen_documents(spark, 1, out)  # 5 000 docs, ~250 planted pairs

    pairs = {
        (r.doc_a, r.doc_b)
        for r in plans.QUERIES["dedup_minhash_banded"](spark, out)
        .select("doc_a", "doc_b")
        .collect()
    }
    planted = {
        (i - 1, i) for i in range(1, 5000) if i % 20 == 7
    }
    found_planted = {p for p in pairs if p in planted}
    recall = len(found_planted) / len(planted)
    assert recall >= 0.6, f"recall {recall:.2f} over {len(planted)} planted pairs"
    # Precision vs ground truth: reported non-planted pairs may exist
    # (word-salad collisions are possible) but must stay a small minority.
    precision = len(found_planted) / max(len(pairs), 1)
    assert precision >= 0.8, f"precision {precision:.2f} ({len(pairs)} reported)"


def test_crypto_shredding_per_user_keys(spark, tmp_path):
    """GDPR crypto-erasure: PII encrypts under per-user AES keys kept in a
    separate key table; deleting a user's KEY row makes their ciphertext
    permanently undecryptable while every other row still decrypts — the
    erasure pattern for immutable storage, complementing the store's
    physical delete + vacuum path."""
    from pyspark.sql import functions as F

    users = spark.createDataFrame(
        [(i, f"user{i}@example.com") for i in range(8)], "uid int, email string"
    )
    keys = spark.createDataFrame(
        [(i, f"{i:016d}") for i in range(8)], "uid int, k string"
    )
    enc = (
        users.join(keys, "uid")
        .select(
            "uid", F.expr("base64(aes_encrypt(email, k))").alias("email_enc")
        )
    )
    enc.write.mode("overwrite").parquet(str(tmp_path / "pii"))

    # Shred user 3: the key row is dropped; ciphertext remains on disk.
    keys_after = keys.where(F.col("uid") != 3)
    stored = spark.read.parquet(str(tmp_path / "pii"))
    dec = stored.join(keys_after, "uid", "left").select(
        "uid",
        F.expr(
            "CAST(try_aes_decrypt(unbase64(email_enc), coalesce(k, '')) AS STRING)"
        ).alias("email"),
    )
    rows = {r.uid: r.email for r in dec.collect()}
    assert rows[3] is None  # unrecoverable
    assert all(rows[i] == f"user{i}@example.com" for i in range(8) if i != 3)


def test_pack_batches_are_shard_bounded(spark, sf_dir):
    """VERDICT r6 item 5: each applyInPandas group is one Arrow batch, so
    the packer must never see a whole source as a single batch. With
    pack_shard = (first 16 bits of md5(doc_id)) mod N_PACK_SHARDS — an
    md5-derived hash, NOT plain doc_id % N, because fixture doc_ids are
    round-robin by source and a whole source would land in one residue —
    every (source, pack_shard) group — the real batch unit — is bounded
    by ~|source|/N shards."""
    from pyspark.sql import functions as F

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import (
        Catalog,
    )
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.curation import (
        N_PACK_SHARDS,
        pack_next_fit,
    )

    cat = Catalog(spark, sf_dir)
    docs = cat.documents.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    packed = pack_next_fit(docs)
    per_source = {
        r.source: r.c
        for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    groups = packed.groupBy("source", "pack_shard").agg(
        F.count("*").alias("c")
    ).collect()
    assert packed.count() == sum(per_source.values())  # nothing dropped
    for g in groups:
        src_n = per_source[g.source]
        # Ceiling of an even split plus modular-residue slack: doc_ids are
        # not contiguous per source, so allow 2x the even share, but a
        # group must never approach the unsharded source size.
        assert g.c <= max(2 * -(-src_n // N_PACK_SHARDS), 8), (
            g.source, g.pack_shard, g.c, src_n,
        )
        if src_n >= 2 * N_PACK_SHARDS:
            assert g.c < src_n
    # Every source with enough docs actually fans out into >1 batch.
    fanout = {}
    for g in groups:
        fanout[g.source] = fanout.get(g.source, 0) + 1
    for src, n in per_source.items():
        if n >= 4 * N_PACK_SHARDS:
            assert fanout[src] > 1, (src, n)
