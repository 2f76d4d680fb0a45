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


def test_kmv_sketch_is_mergeable(spark, sf_dir):
    """The KMV merge law: bottom-k of a union == bottom-k of the combined
    bottom-k's — what lets every partition keep k hashes and a single
    reduce produce the global sketch."""
    from pyspark.sql import functions as F

    k = sketches.KMV_K
    vals = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_custkey").cast("string").alias("v"))
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("v")), 1, 12), 16, 10)
            .cast("bigint")
            .alias("h"),
            (F.col("v").cast("long") % 2).alias("shard"),
        )
    )
    global_bottom = [r.h for r in vals.orderBy("h").limit(k).collect()]
    shard_bottoms = []
    for s in (0, 1):
        shard_bottoms += [
            r.h
            for r in vals.where(F.col("shard") == s).orderBy("h").limit(k).collect()
        ]
    merged = sorted(shard_bottoms)[:k]
    assert merged == global_bottom


def test_countmin_cells_merge_by_addition(spark, sf_dir):
    """Count-min mergeability: sketch(A ⊎ B) equals the cell-wise SUM of
    sketch(A) and sketch(B) — the property that makes the summary a
    map-side partial aggregate."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("shard"),
        F.explode(F.split(F.col("text"), " ")).alias("t"),
    ).where(F.col("t") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("t")), 1, 2), 16, 10)
        .cast("bigint")
        .alias("bucket")
    )
    whole = {
        (r.bucket): r.c
        for r in tok.select(bucket).groupBy("bucket").agg(F.count("*").alias("c")).collect()
    }
    parts: dict[int, int] = {}
    for s in (0, 1):
        for r in (
            tok.where(F.col("shard") == s)
            .select(bucket)
            .groupBy("bucket")
            .agg(F.count("*").alias("c"))
            .collect()
        ):
            parts[r.bucket] = parts.get(r.bucket, 0) + r.c
    assert parts == whole


def test_bloom_words_merge_by_bit_or(spark, sf_dir):
    """Bloom mergeability: the filter of a union is the word-wise OR of the
    shard filters."""
    from pyspark.sql import functions as F

    members = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("k"))
    )
    pos = members.select(
        F.explode(
            F.array(
                *[
                    F.conv(F.substring(F.md5(F.col("k")), 4 * i + 1, 4), 16, 10)
                    .cast("bigint")
                    .alias("p")
                    for i in range(sketches.BLOOM_HASHES)
                ]
            )
        ).alias("pos"),
        (F.conv(F.substring(F.md5(F.col("k")), 31, 2), 16, 10) % 2).alias("shard"),
    )

    def words(df):
        return {
            r.word: r.wval
            for r in df.groupBy((F.col("pos") / 32).cast("bigint").alias("word"))
            .agg(
                F.expr(
                    "bit_or(shiftleft(cast(1 as bigint), cast(pos % 32 as int)))"
                ).alias("wval")
            )
            .collect()
        }

    whole = words(pos)
    merged: dict[int, int] = {}
    for s in (0, 1):
        for w, v in words(pos.where(F.col("shard") == s)).items():
            merged[w] = merged.get(w, 0) | v
    assert merged == whole
