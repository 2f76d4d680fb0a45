"""Spark streaming source over the TCP wire broker (S1, the wire path).

``spark.readStream.format("wire_topic")`` with options ``host``/``port``/
``topic``/``group`` consumes a ``streaming.wirebroker.WireBroker`` topic the
way the reference consumer consumes Kafka (`consumer/consume_items.py`):

- **offsets in the checkpoint**: micro-batches are broker offset ranges, and
  a replayed batch re-FETCHes the identical bytes (the broker log is
  immutable and fetch is non-destructive) — exactly-once with an idempotent
  sink, the same contract as the Kafka source;
- **consumer-group resume**: the reference runs with auto-commit off and
  commits manually after processing (`consume_items.py:27-29,107`).
  ``initialOffset`` asks the broker for the group's committed offset and
  ``commit`` (called by the engine when a micro-batch's epoch completes)
  writes it back — so a NEW query with no checkpoint resumes where the
  group left off instead of re-reading the topic;
- **ranged fetches from executors**: ``read`` runs in worker tasks, each
  opening its own short-lived connection for its slice of the range —
  production Kafka's per-task consumer, not a driver-side drain. Ranges
  split at ``maxRowsPerPartition`` so a large backlog fans out.

Values are opaque strings (the broker's JSON-framed payloads), surfaced as
``(offset bigint, value string)`` — CAST/parse downstream, as with Kafka's
``CAST(value AS STRING)``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "offset bigint, value string"


class _OffsetRange(InputPartition):
    def __init__(self, host: str, port: int, topic: str, start: int, end: int):
        self.host, self.port, self.topic = host, port, topic
        self.start, self.end = start, end


class _WireStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options["port"])
        self.topic = options["topic"]
        self.group = options.get("group", "spark")
        self.max_rows = int(options.get("maxrowsperpartition", 10_000))

    def _client(self):
        from ..streaming.wirebroker import WireClient

        return WireClient(self.host, self.port)

    def initialOffset(self) -> dict:
        with self._client() as c:
            committed = c.committed(self.group, self.topic)
        return {"offset": committed if committed >= 0 else 0}

    def latestOffset(self) -> dict:
        with self._client() as c:
            return {"offset": c.end_offset(self.topic)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["offset"], end["offset"]
        step = self.max_rows
        return [
            _OffsetRange(self.host, self.port, self.topic, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ] or [_OffsetRange(self.host, self.port, self.topic, lo, hi)]

    def read(self, partition: _OffsetRange) -> Iterator[tuple[int, str]]:
        from ..streaming.wirebroker import WireClient

        client = WireClient(partition.host, partition.port)
        try:
            yield from client.fetch(
                partition.topic, partition.start, partition.end
            )
        finally:
            client.close()

    def commit(self, end: dict) -> None:
        # Manual consumer-group commit on epoch completion — the wire twin
        # of the reference's consumer.commit() after processing.
        with self._client() as c:
            c.commit(self.group, self.topic, end["offset"])


class _WireBatchReader(DataSourceReader):
    """``spark.read.format("wire_topic")`` — the whole topic (or an explicit
    ``startOffset``/``endOffset`` range) as a batch frame, range-partitioned
    so each task fetches its own slice — Kafka's batch-read mode."""

    def __init__(self, options: dict):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options["port"])
        self.topic = options["topic"]
        self.start = int(options.get("startoffset", 0))
        self.end = options.get("endoffset")
        self.max_rows = int(options.get("maxrowsperpartition", 10_000))

    def partitions(self) -> list[InputPartition]:
        from ..streaming.wirebroker import WireClient

        if self.end is not None:
            end = int(self.end)
        else:
            with WireClient(self.host, self.port) as c:
                end = c.end_offset(self.topic)
        step = self.max_rows
        return [
            _OffsetRange(self.host, self.port, self.topic, s,
                         min(s + step, end))
            for s in range(self.start, end, step)
        ] or [_OffsetRange(self.host, self.port, self.topic,
                           self.start, end)]

    def read(self, partition: _OffsetRange) -> Iterator[tuple[int, str]]:
        from ..streaming.wirebroker import WireClient

        client = WireClient(partition.host, partition.port)
        try:
            yield from client.fetch(
                partition.topic, partition.start, partition.end
            )
        finally:
            client.close()


class WireTopicDataSource(DataSource):
    """``format("wire_topic")`` — batch + streaming consumer for the TCP
    broker."""

    @classmethod
    def name(cls) -> str:
        return "wire_topic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WireBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _WireStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WireTopicDataSource)
