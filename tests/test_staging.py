"""Staged edge-distillation layer (operators/staging.py — VERDICT r10 #6).

The graph family shares two fixture-derived edge distillations; the staging
layer builds each once per fixture CONTENT and serves every consumer a leaf
parquet scan. These tests pin the three properties correctness depends on:
staged == inline, write-once (the second call reads, never rebuilds), and
content-addressed invalidation (touching a source file forces a rebuild).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hybrid_nutrition_data_pipeline_batch_streaming_spark.operators import staging


def _with_root(monkeypatch, tmp_path):
    root = str(tmp_path / "staged")
    monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", root)
    return root


def test_staged_equals_inline_and_is_write_once(spark, tmp_path, monkeypatch):
    root = _with_root(monkeypatch, tmp_path)
    sf = "/root/testdata/sf0.001"

    got = staging.staged_edges(spark, sf, "cust_supp")
    assert got.columns == ["custkey", "suppkey"]
    inline = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, inline.collect())
    )

    # Write-once: the published directory is not touched by a second call.
    entry = next(d for d in os.listdir(root) if d.startswith("cust_supp-"))
    marker = os.path.join(root, entry, "_SUCCESS")
    mtime = os.stat(marker).st_mtime_ns
    again = staging.staged_edges(spark, sf, "cust_supp")
    assert os.stat(marker).st_mtime_ns == mtime
    assert again.count() == got.count()

    # part_supp twin: same table both consumers derive from.
    ps = staging.staged_edges(spark, sf, "part_supp")
    assert ps.columns == ["partkey", "suppkey"]
    inline_ps = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    assert ps.count() == inline_ps.count()


def test_staged_invalidates_on_source_change(spark, tmp_path, monkeypatch):
    """Fingerprint = (path, size, mtime_ns, tail bytes) of every source
    file: rewriting
    a source with DIFFERENT content must yield a fresh staged entry — the
    stale one is simply never addressed again (no explicit invalidation to
    forget). This is the property that makes the driver's per-round fixture
    regeneration safe."""
    root = _with_root(monkeypatch, tmp_path)
    sf = str(tmp_path / "sf")
    src = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "l_partkey long, l_suppkey long"
    )
    src.write.parquet(f"{sf}/lineitem.parquet")

    first = staging.staged_edges(spark, sf, "part_supp")
    assert first.count() == 3
    fp1 = staging.fingerprint(sf, "part_supp")

    # Regenerate the fixture (the driver does this between rounds).
    spark.createDataFrame(
        [(1, 10), (3, 12)], "l_partkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    fp2 = staging.fingerprint(sf, "part_supp")
    assert fp1 != fp2
    second = staging.staged_edges(spark, sf, "part_supp")
    assert sorted(map(tuple, second.collect())) == [(1, 10), (3, 12)]
    # Both entries exist until pruned by count — the stale one is orphaned,
    # not corrupted.
    entries = [d for d in os.listdir(root) if d.startswith("part_supp-")]
    assert len(entries) == 2


def test_staged_consumers_share_one_entry(spark, tmp_path, monkeypatch):
    """graph_pagerank, graph_kcore and path_counts_census must all resolve
    to the SAME staged cust_supp entry (one build, three readers) — and
    produce their documented shapes from it."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

    root = _with_root(monkeypatch, tmp_path)
    sf = "/root/testdata/sf0.001"
    n_census = plans.QUERIES["path_counts_census"](spark, sf).count()
    n_rec = plans.QUERIES["recursive_path_counts"](spark, sf).count()
    assert n_census == n_rec > 0
    plans.QUERIES["graph_pagerank"](spark, sf).count()
    entries = [d for d in os.listdir(root) if d.startswith("cust_supp-")]
    assert len(entries) == 1  # one fixture → one entry, all consumers


def test_doc_pairs_staged_equals_inline_and_is_shared(spark, tmp_path, monkeypatch):
    """The doc_pairs kind stages the VERIFIED banded-minhash pair table;
    it must equal the registered dedup_minhash_banded query bit-for-bit,
    and the whole document-cluster family must resolve to the one entry."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

    root = _with_root(monkeypatch, tmp_path)
    sf = "/root/testdata/sf0.001"
    staged = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in staging.staged_edges(spark, sf, "doc_pairs").collect()
    }
    inline = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in plans.QUERIES["dedup_minhash_banded"](spark, sf).collect()
    }
    assert staged == inline and staged
    plans.QUERIES["dedup_connected_components"](spark, sf).count()
    plans.QUERIES["graph_degrees"](spark, sf).count()
    plans.QUERIES["dedup_threshold_sweep"](spark, sf).count()
    entries = [d for d in os.listdir(root) if d.startswith("doc_pairs-")]
    assert len(entries) == 1


def test_corpus_pairs_staged_equals_inline_and_is_shared(
    spark, tmp_path, monkeypatch
):
    """The corpus_pairs kind stages banded-minhash pairs over the GATED
    survivor set; it must equal the inline build over corpus_gate_survivors
    bit-for-bit, and both consuming pipelines must resolve to the one
    entry."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.corpus import (
        corpus_gate_survivors,
    )
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.dedup import (
        banded_minhash_pairs,
    )

    root = _with_root(monkeypatch, tmp_path)
    sf = "/root/testdata/sf0.001"
    staged = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in staging.staged_edges(spark, sf, "corpus_pairs").collect()
    }
    inline = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in banded_minhash_pairs(
            corpus_gate_survivors(Catalog(spark, sf)).select("doc_id", "text")
        ).collect()
    }
    assert staged == inline
    assert plans.QUERIES["pipeline_corpus_build"](spark, sf).count() > 0
    assert plans.QUERIES["pipeline_drop_reasons"](spark, sf).count() > 0
    entries = [d for d in os.listdir(root) if d.startswith("corpus_pairs-")]
    assert len(entries) == 1


def test_hp_index_staged_equals_inline_and_probe_reads_it(
    spark, tmp_path, monkeypatch
):
    """The hp_index kind stages the seeded-hyperplane ANN index (buckets +
    norms, codes-only): it must equal the inline hp_index_frame projection
    bit-for-bit, and both consumers (the ANN query and its recall
    contract) must resolve to the one entry."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.similarity import (
        hp_index_frame,
    )

    root = _with_root(monkeypatch, tmp_path)
    sf = "/root/testdata/sf0.001"
    staged = sorted(
        map(tuple, staging.staged_edges(spark, sf, "hp_index").collect())
    )
    inline = sorted(
        map(tuple, hp_index_frame(Catalog(spark, sf).embeddings).collect())
    )
    assert staged == inline and staged
    rows = plans.QUERIES["similarity_ann_hyperplane"](spark, sf).collect()
    assert rows
    contract = plans.QUERIES["similarity_ann_hyperplane_recall"](spark, sf).collect()
    assert contract and all(r.recall_ok for r in contract)
    entries = [d for d in os.listdir(root) if d.startswith("hp_index-")]
    assert len(entries) == 1


def test_doc_tf_staged_equals_inline_and_is_shared(spark, tmp_path, monkeypatch):
    """The doc_tf kind stages the per-document RLE tf index: it must equal
    the inline doc_tf_frame projection exactly (tf bags compared as sets —
    struct order within a doc is the deterministic sort, but compare
    robustly), and the retrieval family must resolve to the one entry."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans.search import (
        doc_tf_frame,
    )

    root = _with_root(monkeypatch, tmp_path)
    sf = "/root/testdata/sf0.001"
    staged = {
        r.doc_id: (r.dl, sorted((e.tok, e.tf) for e in r.tfs))
        for r in staging.staged_edges(spark, sf, "doc_tf").collect()
    }
    inline = {
        r.doc_id: (r.dl, sorted((e.tok, e.tf) for e in r.tfs))
        for r in doc_tf_frame(Catalog(spark, sf).documents).collect()
    }
    assert staged == inline and staged
    assert plans.QUERIES["bm25_search"](spark, sf).count() > 0
    assert plans.QUERIES["text_search_rank"](spark, sf).count() > 0
    assert plans.QUERIES["tfidf_terms"](spark, sf).count() > 0
    entries = [d for d in os.listdir(root) if d.startswith("doc_tf-")]
    assert len(entries) == 1


def test_builder_version_participates_in_fingerprint(monkeypatch, tmp_path):
    """Bumping a builder's version string must orphan old entries even when
    the source data is byte-identical — the guard against a future round
    changing pair SEMANTICS while stale staged tables survive on disk."""
    sf = str(tmp_path / "sf")
    os.makedirs(f"{sf}")
    with open(f"{sf}/documents.parquet", "wb") as f:
        f.write(b"stub")  # fingerprint stats the file + reads its tail bytes
    fp_v1 = staging.fingerprint(sf, "doc_pairs")
    monkeypatch.setitem(
        staging._KINDS, "doc_pairs", (("documents",), "v2-test")
    )
    assert staging.fingerprint(sf, "doc_pairs") != fp_v1


def test_fingerprint_senses_content_under_preserved_mtime(tmp_path):
    """ADVICE r11: a fixture restored with preserved size AND mtime (cp -p,
    rsync -t, snapshot restore) must NOT collide with the old fingerprint —
    the tail-byte content token disambiguates."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    p = f"{sf}/documents.parquet"
    with open(p, "wb") as f:
        f.write(b"A" * 128)
    st = os.stat(p)
    fp1 = staging.fingerprint(sf, "doc_pairs")
    with open(p, "wb") as f:
        f.write(b"B" * 128)  # same size...
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # ...same mtime
    assert staging.fingerprint(sf, "doc_pairs") != fp1


def test_prune_is_per_kind_and_never_evicts_session_entries(tmp_path, monkeypatch):
    """VERDICT r11 what's-wrong #3 / ADVICE r11: (a) the cap applies PER
    kind, so many kinds × fixtures in one session cannot evict each other;
    (b) entries published during THIS process are never pruned even past
    the cap (a lazy DataFrame may still reference them)."""
    import time

    root = str(tmp_path / "staged")
    os.makedirs(root)
    old = time.time() - 7 * 86_400
    # 12 stale entries of one kind, 3 of another — all pre-session.
    for i in range(12):
        d = os.path.join(root, f"cust_supp-{i:016x}")
        os.makedirs(d)
        os.utime(d, (old + i, old + i))
    for i in range(3):
        d = os.path.join(root, f"doc_pairs-{i:016x}")
        os.makedirs(d)
        os.utime(d, (old + i, old + i))
    staging._prune(root)
    kept_cs = sorted(d for d in os.listdir(root) if d.startswith("cust_supp-"))
    kept_dp = sorted(d for d in os.listdir(root) if d.startswith("doc_pairs-"))
    assert len(kept_cs) == staging._KEEP_NEWEST  # oldest 4 evicted
    assert kept_cs[0] == f"cust_supp-{4:016x}"
    assert len(kept_dp) == 3  # other kind untouched by cust_supp's overflow

    # Session-published entries survive even 12-past-the-cap: fresh mtimes
    # (>= process start) are exempt.
    for i in range(12, 24):
        os.makedirs(os.path.join(root, f"cust_supp-{i:016x}"))
    staging._prune(root)
    fresh = [
        d
        for d in os.listdir(root)
        if d.startswith("cust_supp-") and int(d.split("-")[1], 16) >= 12
    ]
    assert len(fresh) == 12


def test_partial_published_dir_is_cleared_and_republished(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (medium): a non-empty published dir WITHOUT _SUCCESS (an
    interrupted prune/rmtree wreck) previously made every later call fail
    the rename and silently read the partial parquet. Now the builder
    verifies _SUCCESS, clears the wreck, and republishes."""
    root = _with_root(monkeypatch, tmp_path)
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "l_partkey long, l_suppkey long"
    ).write.parquet(f"{sf}/lineitem.parquet")
    path = os.path.join(root, f"part_supp-{staging.fingerprint(sf, 'part_supp')}")
    os.makedirs(path)
    with open(os.path.join(path, "junk"), "wb") as f:
        f.write(b"partial wreck")  # non-empty, no _SUCCESS

    got = staging.staged_edges(spark, sf, "part_supp")
    assert sorted(map(tuple, got.collect())) == [(1, 10), (1, 11), (2, 10)]
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "junk"))


def test_prune_reclaims_crashed_builder_tmp(tmp_path, monkeypatch):
    """A builder that crashes between write and rename leaves a .tmp-<pid>
    directory; _prune reclaims it once it is clearly dead (age > 1 day)
    while leaving a FRESH tmp (a live concurrent build) untouched."""
    import time

    root = str(tmp_path / "staged")
    os.makedirs(root)
    dead = os.path.join(root, "cust_supp-deadbeef.tmp-999")
    live = os.path.join(root, "cust_supp-cafef00d.tmp-1000")
    os.makedirs(dead)
    os.makedirs(live)
    old = time.time() - 2 * 86_400
    os.utime(dead, (old, old))
    staging._prune(root)
    assert not os.path.exists(dead)
    assert os.path.exists(live)
