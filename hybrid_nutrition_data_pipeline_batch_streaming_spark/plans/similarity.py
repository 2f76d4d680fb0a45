"""Embedding similarity search over the embeddings table (SURVEY.md §2.11 X1).

Three tiers, by scale:

- ``similarity_topk``    — exact brute-force cosine top-k for a bounded query
                           set: crossJoin(queries × corpus) where the query
                           side is tiny and broadcast. Exact baseline.
- ``similarity_ann_lsh`` — sign-random-projection LSH: corpus and queries
                           hash to sign-pattern buckets; top-k within bucket.
                           The bucket key turns the O(n·m) scan into an
                           equi-join — the 100 TB path (same shape as an IVF
                           coarse quantizer: bucket = cell).
- ``dedup_embedding``    — cosine near-duplicate pairs within buckets
                           (threshold instead of top-k) — embedding-space
                           near-dedup for training data.

Dot products fold left-to-right over the array in both engines (Spark
``aggregate`` / DuckDB ``list_reduce``), so the double cosine is
bit-identical and safe to hash-compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from .registry import query

N_QUERIES = 20  # bounded probe set for the exact variant
TOP_K = 5
SIGN_BITS = 6  # LSH bucket = sign pattern of the first 6 dims


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left fold of the elementwise product — bit-deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


# DuckDB twins (expressions over DOUBLE[] columns {x}, {y}).
def _dot_sql(x: str, y: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({x})), "
        f"i -> {x}[i] * {y}[i]), (a, b) -> a + b)"
    )


def _norm_sql(x: str) -> str:
    return f"sqrt({_dot_sql(x, x)})"


_COS_SQL = f"{_dot_sql('qe', 'ce')} / ({_norm_sql('qe')} * {_norm_sql('ce')})"


@query(
    "similarity_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id, {_COS_SQL} AS cosine
        FROM q JOIN c ON query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k (X1 baseline): a bounded query set is
    broadcast against the corpus, scored JVM-side with higher-order array
    functions, and ranked per query. The per-query row_number top-k keeps
    only k rows per partition past the window."""
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _to_double(F.col("embedding")).alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), _to_double(F.col("embedding")).alias("ce")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _bucket(arr_double: Column) -> Column:
    """Sign-random-projection bucket: integer from the sign bits of the
    first SIGN_BITS coordinates (axis-aligned SRP — deterministic and
    dialect-portable; a production variant uses seeded random hyperplanes)."""
    bucket = F.lit(0)
    for i in range(SIGN_BITS):
        bucket = bucket + F.when(
            F.element_at(arr_double, i + 1) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


_BUCKET_SQL = " + ".join(
    f"CASE WHEN e[{i + 1}] > 0 THEN {2**i} ELSE 0 END" for i in range(SIGN_BITS)
)


@query(
    "similarity_ann_lsh",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), bucketed AS (
        SELECT vec_id, e, CAST({_BUCKET_SQL} AS INT) AS bucket FROM base
    ), q AS (
        SELECT vec_id AS query_id, e AS qe, bucket
        FROM bucketed WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cosine
        FROM q JOIN (SELECT vec_id, e AS ce, bucket FROM bucketed) c
          ON q.bucket = c.bucket AND q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {TOP_K}
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-LSH bucketing (X1 scale path): candidates
    come from an equi-join on the bucket key, so the work is
    O(n · bucket_occupancy) instead of O(n²); scoring/ranking as in the
    exact variant. Recall/cost tunes via SIGN_BITS (and multi-probe at
    production scale)."""
    cat = Catalog(spark, sf_dir)
    base = cat.embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    ).withColumn("bucket", _bucket(F.col("e")))
    q = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), "bucket"
    )
    c = base.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), "bucket")
    scored = q.join(
        c, (q["bucket"] == c["bucket"]) & (F.col("query_id") != F.col("neighbor_id"))
    ).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@query(
    "dedup_embedding",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), bucketed AS (
        SELECT vec_id, e, CAST({_BUCKET_SQL} AS INT) AS bucket FROM base
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_dot_sql('a.e', 'b.e')}
             / ({_norm_sql('a.e')} * {_norm_sql('b.e')}) AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_dot_sql('a.e', 'b.e')}
             / ({_norm_sql('a.e')} * {_norm_sql('b.e')}) > 0.6
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (X2/X1 hybrid): within-bucket
    self-join, emit pairs above a cosine threshold — semantic dedup of
    training data. Same equi-join blocking as the ANN path."""
    cat = Catalog(spark, sf_dir)
    base = cat.embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    ).withColumn("bucket", _bucket(F.col("e")))
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("bucket").alias("ba")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("bucket").alias("bb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") > 0.6)
    )
