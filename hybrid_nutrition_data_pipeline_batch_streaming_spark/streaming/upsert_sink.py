"""Streaming keyed-upsert sink via foreachBatch (SURVEY.md §2.1 S4, §2.9 T7).

The reference's raw layer is a Cassandra table whose PRIMARY KEY makes every
INSERT a last-write-wins upsert (`consumer/consume_items.py:53,102-103`).
Structured Streaming's file sinks are append-only, so keyed upserts go
through ``foreachBatch``: each micro-batch is merged into the keyed store
with LWW semantics.

Store layout: hash-bucketed hive partitions (``bucket=N/``,
N = pmod(xxhash64(key), n_buckets)) so a merge

- reads ONLY the buckets the micro-batch touches (partition pruning on the
  bucket column — O(touched buckets), not O(store));
- rewrites only those buckets, each promoted from a staging directory via
  an atomic directory rename (never a second overwrite of the live copy);
- leaves untouched buckets' files byte-identical.

In production the store is a Delta/Iceberg table and the merge is
``MERGE INTO`` (transactional across buckets, which a per-bucket rename is
not — a crash mid-promotion can leave some buckets new and some old, though
never lost); this implementation keeps the same call shape over plain
parquet so the engine runs dependency-free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import dedup_last_write_wins

BUCKET_COL = "bucket"


class ParquetUpsertStore:
    """A keyed store with last-write-wins merge semantics, hash-bucketed so
    merges scale with the micro-batch, not the store."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        ts_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.ts_col = ts_col
        self.n_buckets = n_buckets

    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)).cast("int")

    def _live_buckets(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(name.split("=", 1)[1])
            for name in os.listdir(self.path)
            if name.startswith(f"{BUCKET_COL}=")
        )

    def exists(self) -> bool:
        return bool(self._live_buckets())

    def read(self) -> DataFrame | None:
        """The merged store, or None if no merge has committed yet.

        Existence is checked explicitly (never inferred from a swallowed
        read error — a transient/corruption failure must surface, not
        silently reset the store to empty)."""
        if not self.exists():
            return None
        return self.spark.read.parquet(self.path).drop(BUCKET_COL)

    def _read_buckets(self, buckets: list[int]) -> DataFrame | None:
        live = [b for b in buckets if b in set(self._live_buckets())]
        if not live:
            return None
        return (
            self.spark.read.parquet(self.path)
            .where(F.col(BUCKET_COL).isin(live))  # prunes to bucket=N dirs
            .drop(BUCKET_COL)
        )

    def merge(self, batch: DataFrame) -> None:
        """LWW-merge one micro-batch: read touched buckets, union, dedup,
        rewrite touched buckets via staging + atomic rename."""
        with_bucket = batch.withColumn(BUCKET_COL, self._bucket())
        # Driver-side list of touched bucket ids — bounded by n_buckets,
        # never by data volume.
        touched = sorted(
            r[0]
            for r in with_bucket.select(BUCKET_COL).distinct().collect()
            if r[0] is not None
        )
        if not touched:
            return
        current = self._read_buckets(touched)
        merged = batch if current is None else current.unionByName(batch)
        deduped = dedup_last_write_wins(merged, key=self.key, ts=self.ts_col)
        staging = self.path + "__staging"
        shutil.rmtree(staging, ignore_errors=True)
        (
            deduped.withColumn(BUCKET_COL, self._bucket())
            .repartition(len(touched), BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(staging)
        )
        os.makedirs(self.path, exist_ok=True)
        for b in touched:
            stage_dir = os.path.join(staging, f"{BUCKET_COL}={b}")
            if not os.path.isdir(stage_dir):
                continue  # key hashed here had no surviving rows (can't happen under LWW)
            live_dir = os.path.join(self.path, f"{BUCKET_COL}={b}")
            old_dir = live_dir + "__old"
            shutil.rmtree(old_dir, ignore_errors=True)
            if os.path.isdir(live_dir):
                os.rename(live_dir, old_dir)
            os.rename(stage_dir, live_dir)  # atomic promote on POSIX
            shutil.rmtree(old_dir, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)


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
