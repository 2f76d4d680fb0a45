"""Columnar sinks (SURVEY.md §2.1 S4/S5) — layout choices that decide scan
cost at 100 TB.

The reference delegates layout to MergeTree ``ORDER BY (item_name,
ingestion_ts)`` (`dagster_project/pipeline.py:105-107`); the Spark analog is
explicit: directory partitioning on the coarse pruning key + in-file
clustering on the lookup key. Partition pruning then removes whole
directories at plan time (PartitionFilters) and row-group min/max stats
prune within files — the two levers that turn a 100 TB scan into a GB read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet with optional in-file clustering.

    ``partition_cols`` should be low-cardinality pruning keys (date buckets,
    tenant); ``cluster_cols`` the in-partition lookup order. Rows are
    repartitioned on the partition key first so each task writes few files
    (avoids the small-files explosion that kills object-store listings).
    """
    out = df.repartition(*[df[c] for c in partition_cols])
    if cluster_cols:
        out = out.sortWithinPartitions(*(partition_cols + cluster_cols))
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffled layout so future equi-joins and
    aggregations on ``bucket_col`` skip their shuffle entirely — the
    co-located-join strategy for fact-fact joins repeated across jobs."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_pruned(spark: SparkSession, path: str, predicate: Column) -> DataFrame:
    """Scan a partitioned dataset with a pruning predicate; Catalyst turns
    predicates on partition columns into PartitionFilters (no I/O for
    excluded directories)."""
    return spark.read.parquet(path).where(predicate)
