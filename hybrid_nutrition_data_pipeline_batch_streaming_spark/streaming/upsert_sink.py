"""Streaming keyed-upsert sink via foreachBatch (SURVEY.md §2.1 S4, §2.9 T7).

The reference's raw layer is a Cassandra table whose PRIMARY KEY makes every
INSERT a last-write-wins upsert (`consumer/consume_items.py:53,102-103`).
Structured Streaming's file sinks are append-only, so keyed upserts go
through ``foreachBatch``: each micro-batch is merged into the keyed store
with LWW semantics. In production the store is a Delta/Iceberg table and the
merge is ``MERGE INTO`` (transactional, partition-pruned); this
implementation keeps the same call shape over plain parquet so the engine
runs dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import dedup_last_write_wins


class ParquetUpsertStore:
    """A minimal keyed store with last-write-wins merge semantics."""

    def __init__(self, spark: SparkSession, path: str, key: str, ts_col: str):
        self.spark = spark
        self.path = path
        self.key = key
        self.ts_col = ts_col

    def read(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None  # first batch: store does not exist yet

    def merge(self, batch: DataFrame) -> None:
        current = self.read()
        merged = batch if current is None else current.unionByName(batch)
        deduped = dedup_last_write_wins(merged, key=self.key, ts=self.ts_col)
        # Rewrite via a temp dir: the plan reads the same path it overwrites.
        tmp = self.path + "__staging"
        deduped.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)


def upsert_stream(
    stream: DataFrame,
    store: ParquetUpsertStore,
    checkpoint: str,
):
    """Run a stream into the keyed store with exactly-once micro-batches:
    checkpoint tracks which batches merged, foreachBatch applies the LWW
    merge — together they re-create the reference's Cassandra upsert
    without its racy read-modify-write (`pipeline.py:144-150`)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        store.merge(batch)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
