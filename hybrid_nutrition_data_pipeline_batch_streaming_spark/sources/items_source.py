"""Custom Python DataSource: the reference's food-item PRODUCER as a
first-class Spark source (SURVEY.md §2.1 S2, §2.9 T1).

The reference generates item names in a driver-side loop (OpenAI call +
in-memory dedup + Kafka send, `producer/produce_items.py:15-66`, one message
per 5 s). Spark 4's Python DataSource API turns that into a real source:

- **batch**: ``spark.read.format("nutrition_items").option("numRows", n)``
  — generation is PARTITIONED (each task generates its id range), so the
  producer scales horizontally instead of pacing a single loop;
- **streaming**: ``spark.readStream.format("nutrition_items")`` — offsets
  are plain row counters, so micro-batches are contiguous id ranges,
  checkpoint-replayable exactly like Kafka offsets (T3), with
  ``rowsPerBatch``/``totalRows`` bounding cadence and lifetime.

Item names are a pure function of the row id (md5-indexed picks from fixed
word lists), standing in for the LLM call: deterministic, engine-portable
(the same arithmetic is expressible in SQL — see ``plans/pysource.py``'s
oracle), and dedup-free by construction where the reference needed a retry
set (`produce_items.py:48-59`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: 16 × 16 deterministic name space, indexed by the first two hex digits of
#: md5(id). Lowercase a-z only so downstream tokenizers see clean input.
ADJECTIVES = (
    "golden", "roasted", "spicy", "fresh", "smoked", "creamy", "crispy",
    "sweet", "savory", "pickled", "grilled", "stuffed", "glazed", "herbed",
    "toasted", "chilled",
)
FOODS = (
    "avocado", "lentil", "salmon", "quinoa", "almond", "yogurt", "kale",
    "chickpea", "turkey", "mango", "beet", "barley", "tofu", "walnut",
    "spinach", "oat",
)

SCHEMA = "item_id bigint, item_name string"
_HEX = "0123456789abcdef"


def item_name_for(item_id: int) -> str:
    """adjective[h1] + ' ' + food[h2], h = first md5 hex digits of str(id).

    Both engines agree: Spark/DuckDB ``md5(CAST(id AS STRING))`` produces
    the same digest text this function hashes.
    """
    h = hashlib.md5(str(item_id).encode()).hexdigest()
    return f"{ADJECTIVES[_HEX.index(h[0])]} {FOODS[_HEX.index(h[1])]}"


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _gen(start: int, end: int) -> Iterator[tuple[int, str]]:
    for i in range(start, end):
        yield i, item_name_for(i)


class _ItemsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.num_rows = int(options.get("numrows", 1000))
        self.num_partitions = int(options.get("numpartitions", 4))

    def partitions(self) -> list[InputPartition]:
        step = max(1, self.num_rows // self.num_partitions)
        bounds = list(range(0, self.num_rows, step)) + [self.num_rows]
        return [_IdRange(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _IdRange) -> Iterator[tuple[int, str]]:
        return _gen(partition.start, partition.end)


class _ItemsStreamReader(DataSourceStreamReader):
    """Offsets are row counters — contiguous id ranges per micro-batch, so
    a replayed batch regenerates the identical rows (exactly-once with any
    idempotent/transactional sink, the Kafka-offset contract).

    Pacing (default): ``latestOffset`` advances by ``rowsPerBatch`` per
    call — the source keeps "producing" while the query runs, like the
    reference's looping producer. Under ``Trigger.AvailableNow`` only the
    backlog at query start (one step) drains; use a continuous trigger to
    consume the whole id space, or set ``drain=all`` to advertise the full
    ``totalRows`` backlog up front so a single AvailableNow run consumes
    every offset (the bounded batch-drain mode, T5).

    Restart safety: the paced counter is re-anchored to the engine-supplied
    offsets in ``partitions``/``commit`` — after a driver restart a fresh
    reader instance never reports a latest offset BEHIND the checkpointed
    committed offset (which would stall the query with empty/invalid
    ranges)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.total_rows = int(options.get("totalrows", 1000))
        self.drain_all = str(options.get("drain", "")).lower() == "all"
        self._current = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        if self.drain_all:
            return {"offset": self.total_rows}
        self._current = min(self._current + self.rows_per_batch, self.total_rows)
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # Re-anchor the pacing counter to the engine's offset log: on
        # restart this is called with the checkpointed range before the
        # next latestOffset, so the counter catches up instead of lagging.
        self._current = max(self._current, end["offset"])
        return [_IdRange(start["offset"], end["offset"])]

    def read(self, partition: _IdRange) -> Iterator[tuple[int, str]]:
        return _gen(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        # Generation is stateless per range — nothing to clean up; just
        # keep the pacing counter at or ahead of the committed offset.
        self._current = max(self._current, end["offset"])


class NutritionItemsDataSource(DataSource):
    """``format("nutrition_items")`` — batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "nutrition_items"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _ItemsBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ItemsStreamReader(self.options)


def register(spark) -> None:
    # Data-source worker processes re-import this module; ship the package
    # so the import resolves regardless of the driver's cwd/sys.path.
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.dataSource.register(NutritionItemsDataSource)
