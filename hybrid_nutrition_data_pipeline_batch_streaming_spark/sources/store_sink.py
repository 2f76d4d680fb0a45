"""Custom Python DataSource SINK (Spark 4 DataSource API, writer side).

The reference's consumer is a sink: it upserts enriched items into Cassandra
keyed by item name (`consumer/consume_items.py:90-103`, table DDL
`consumer/consume_items.py:40-53`). `sources/items_source.py` re-expresses
the producer side of that loop as a first-class Spark source; this module
completes the API family with the writer side — a transactional
JSONL-directory store implementing both `DataSourceWriter` (batch) and
`DataSourceStreamWriter` (streaming) with the API's two-phase contract:

- tasks write to a hidden staging area and return the staged file in their
  `WriterCommitMessage`; nothing is visible until the driver-side commit,
- `commit` promotes staged files into `batch-<id>/` and drops a marker in
  `_commits/` — and is IDEMPOTENT on the marker, so a micro-batch replayed
  after a crash-between-commit-and-checkpoint lands exactly once,
- `abort` removes staged files — a failed job leaves the store untouched.

This is the Python-API analog of the foreachBatch upsert sink
(`streaming/upsert_sink.py`): use that one for keyed LWW merges; use this
shape when the target is an external system with its own transactional
append (the Cassandra case — `write()` would batch rows to the driver's
session pool and the commit message would carry applied write tokens).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


def _stage_rows(base: str, iterator) -> _StagedFile:
    """Write one partition's rows to a staged JSONL file (task side)."""
    os.makedirs(os.path.join(base, ".staging"), exist_ok=True)
    path = os.path.join(base, ".staging", f"{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
            f.write("\n")
            n += 1
    return _StagedFile(path=path, rows=n)


def _promote(base: str, messages, batch_dir: str, marker: str) -> None:
    """Driver-side commit: move staged files into place, then mark. The
    marker check makes a replayed commit a no-op (exactly-once), and a
    crash BEFORE the marker leaves only an unreferenced batch dir that the
    retry overwrites file-by-file (staged names are unique per attempt)."""
    commits = os.path.join(base, "_commits")
    os.makedirs(commits, exist_ok=True)
    marker_path = os.path.join(commits, marker)
    if os.path.exists(marker_path):
        for m in messages:  # replayed batch: discard the new attempt's files
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        return
    os.makedirs(os.path.join(base, batch_dir), exist_ok=True)
    total = 0
    for m in messages:
        if m is None:
            continue
        os.rename(
            m.path, os.path.join(base, batch_dir, os.path.basename(m.path))
        )
        total += m.rows
    tmp = marker_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"rows": total, "files": sum(1 for m in messages if m)}, f)
    os.rename(tmp, marker_path)  # the atomic commit point


def _discard(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.path):
            os.remove(m.path)


class _StoreBatchWriter(DataSourceWriter):
    """One writer instance = one logical batch write: the commit id is
    minted per instance, so repeated ``save()`` calls APPEND new batch dirs
    (a fixed marker name would make the second save a silent no-op — the
    idempotency marker exists for STREAMING replays, which key on Spark's
    own batchId, not for independent batch jobs)."""

    def __init__(self, base: str):
        self._base = base
        self._write_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _StagedFile:
        return _stage_rows(self._base, iterator)

    def commit(self, messages) -> None:
        _promote(
            self._base, messages, f"batch-{self._write_id}", self._write_id
        )

    def abort(self, messages) -> None:
        _discard(messages)


class _StoreStreamWriter(DataSourceStreamWriter):
    """Streaming commits are keyed by Spark's batchId, which is unique per
    CHECKPOINT — so one store path serves ONE streaming query (two streams
    would collide on batch 0's marker and the second would silently discard
    its first batch). Multi-stream fan-in goes through separate paths or
    the keyed upsert store, same single-writer contract as that store."""

    def __init__(self, base: str):
        self._base = base

    def write(self, iterator) -> _StagedFile:
        return _stage_rows(self._base, iterator)

    def commit(self, messages, batchId: int) -> None:
        _promote(self._base, messages, f"batch-{batchId}", str(batchId))

    def abort(self, messages, batchId: int) -> None:
        _discard(messages)


class JsonStoreDataSource(DataSource):
    """`format("json_store")` — register with
    ``spark.dataSource.register(JsonStoreDataSource)``; option ``path`` is
    the store directory."""

    @classmethod
    def name(cls) -> str:
        return "json_store"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _StoreBatchWriter(self.options["path"])

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _StoreStreamWriter(self.options["path"])


def read_store(spark, base: str):
    """Read back committed batches only (staging/markers excluded)."""
    import glob

    files = sorted(glob.glob(os.path.join(base, "batch-*", "*.jsonl")))
    if not files:
        return spark.createDataFrame([], "placeholder string").limit(0)
    return spark.read.json(files)
