"""Query surface for the custom Python DataSource (sources/items_source.py).

Even a Python-implemented SOURCE stays inside the exact-parity discipline:
row content is a pure function of the row id, so the DuckDB oracle
regenerates the identical table from ``generate_series`` + the same
md5-digit arithmetic — a full value-hash check on a source that never
touches the fixture parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.items_source import ADJECTIVES, FOODS, register
from .registry import query

_N = 1000


def _word_list_sql(words: tuple[str, ...], digit_pos: int) -> str:
    values = ", ".join(f"'{w}'" for w in words)
    return (
        f"list_value({values})[strpos('0123456789abcdef', "
        f"substr(md5(CAST(i AS VARCHAR)), {digit_pos}, 1))]"
    )


@query(
    "pysource_items",
    oracle=f"""
    SELECT i AS item_id,
           {_word_list_sql(ADJECTIVES, 1)} || ' ' || {_word_list_sql(FOODS, 2)}
               AS item_name
    FROM generate_series(0, {_N - 1}) t(i)
    """,
)
def pysource_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's producer (`produce_items.py:15-66`) as a partitioned
    Spark batch source: each task generates its own id range through the
    Python DataSource API — no driver loop, no pacing sleep, horizontally
    scalable. Names are md5-indexed picks from fixed word lists, so the
    oracle reconstructs the exact table in SQL; ``sf_dir`` is unused (the
    source is generative)."""
    register(spark)
    return (
        spark.read.format("nutrition_items")
        .option("numRows", _N)
        .option("numPartitions", 4)
        .load()
    )


_WIRE_N = 200


@query(
    "wire_topic_roundtrip",
    oracle=f"""
    SELECT i AS msg_offset,
           {_word_list_sql(ADJECTIVES, 1)} || ' ' || {_word_list_sql(FOODS, 2)}
               AS item_name
    FROM generate_series(0, {_WIRE_N - 1}) t(i)
    """,
)
def wire_topic_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka wire path, live and value-checked (S1/S2): a real TCP
    line-protocol broker (streaming/wirebroker.py) is started in-process,
    a producer client pushes deterministic item names over the socket, and
    ``format("wire_topic")`` — the engine's offset-ranged streaming
    consumer — drains the topic through a checkpointable AvailableNow run.
    One sequential producer ⇒ broker offset i carries item_name_for(i), so
    the oracle regenerates the exact (offset, name) table from the same
    md5-digit arithmetic as ``pysource_items``. Exercises the reference's
    produce→consume loop (`producer/produce_items.py:30-41`,
    `consumer/consume_items.py:21-35`) over real bytes on a real socket;
    exactly-once/restart/consumer-group semantics are pinned in
    tests/test_wire_broker.py. ``sf_dir`` is unused (the source is the
    broker)."""
    from pyspark.sql import functions as F

    from ..sources.wire_source import register as register_wire
    from ..streaming.ingest import run_to_memory
    from ..sources.items_source import item_name_for
    from ..streaming.wirebroker import WireBroker, WireClient

    broker = WireBroker()
    host, port = broker.start()
    try:
        with WireClient(host, port) as client:
            for i in range(_WIRE_N):
                client.produce("items", item_name_for(i))
        register_wire(spark)
        stream = (
            spark.readStream.format("wire_topic")
            .option("host", host)
            .option("port", port)
            .option("topic", "items")
            .option("group", "parity")
            .option("maxRowsPerPartition", 64)
            .load()
        )
        # Drain fully into the memory sink; the returned frame is
        # materialized, so the broker can stop before the caller collects.
        out = run_to_memory(stream)
        return out.select(
            F.col("offset").alias("msg_offset"),
            F.col("value").alias("item_name"),
        )
    finally:
        broker.stop()


_WS_N = 720  # wire messages; ts = epoch + i·97 s → spans ~19 hourly buckets


@query(
    "wire_stream_windows",
    oracle=f"""
    WITH msgs AS (
        SELECT i,
               (i % 25)::BIGINT AS user_id,
               ((i * 37) % 10000)::BIGINT AS cents,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * 97) SECOND
                   AS ts
        FROM generate_series(0, {_WS_N - 1}) t(i)
    )
    SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
               AS bucket_start,
           CAST(COUNT(*) AS BIGINT)           AS event_cnt,
           CAST(SUM(cents) AS BIGINT)         AS total_cents,
           CAST(SUM(user_id) AS BIGINT)       AS user_id_sum
    FROM msgs GROUP BY 1
    """,
)
def wire_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows over the LIVE wire path (T6 × S1): the
    TCP broker carries CSV-framed messages whose event time / user / value
    are pure functions of the offset, the ``wire_topic`` streaming source
    drains them, and a watermarked 1-hour tumbling aggregation runs on the
    stream — so the full Kafka-shaped chain (socket bytes → parse →
    event-time window → sink) is value-checked against a closed-form
    oracle. Complete-mode AvailableNow drain like ``stream_tumbling_live``;
    ``sf_dir`` unused (the source is the broker)."""
    from pyspark.sql import functions as F

    from ..sources.wire_source import register as register_wire
    from ..streaming.ingest import run_to_memory
    from ..streaming.wirebroker import WireBroker, WireClient

    epoch = 1704067200  # 2024-01-01 00:00:00 UTC
    broker = WireBroker()
    host, port = broker.start()
    try:
        with WireClient(host, port) as client:
            for i in range(_WS_N):
                client.produce(
                    "events", f"{i % 25},{(i * 37) % 10000},{epoch + i * 97}"
                )
        register_wire(spark)
        stream = (
            spark.readStream.format("wire_topic")
            .option("host", host)
            .option("port", port)
            .option("topic", "events")
            .option("group", "windows")
            .option("maxRowsPerPartition", 128)
            .load()
        )
        parts = F.split("value", ",")
        parsed = stream.select(
            parts[0].cast("long").alias("user_id"),
            parts[1].cast("long").alias("cents"),
            # plain TIMESTAMP (session TZ is pinned UTC): watermarks
            # reject TIMESTAMP_NTZ event-time columns.
            F.timestamp_seconds(parts[2].cast("long")).alias("ts"),
        ).withWatermark("ts", "2 hours")
        windowed = (
            parsed.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count("*").alias("event_cnt"),
                F.sum("cents").alias("total_cents"),
                # COUNT DISTINCT is unsupported inside a streaming agg —
                # the membership check rides a SUM instead.
                F.sum("user_id").alias("user_id_sum"),
            )
            .select(
                F.col("w.start").alias("bucket_start"),
                "event_cnt",
                "total_cents",
                "user_id_sum",
            )
        )
        return run_to_memory(windowed, output_mode="complete")
    finally:
        broker.stop()


_WMP_N = 300  # messages across a 3-partition topic
_WMP_PARTS = 3


@query(
    "wire_mp_roundtrip",
    oracle=f"""
    SELECT CAST(i % {_WMP_PARTS} AS INT) AS "partition",
           i // {_WMP_PARTS} AS msg_offset,
           {_word_list_sql(ADJECTIVES, 1)} || ' ' || {_word_list_sql(FOODS, 2)}
               AS item_name
    FROM generate_series(0, {_WMP_N - 1}) t(i)
    """,
)
def wire_mp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTI-PARTITION wire path, live and value-checked (round-6 S1/S2
    upgrade): the topic is CREATEd with 3 partitions — one append-only log
    per partition, the real Kafka topic model — message i is produced to
    partition i % 3 (explicit routing, so per-partition offsets are dense
    in production order: i = partition + 3·offset), and the streaming
    source's ``partitions()`` maps one broker partition (split at
    maxRowsPerPartition) to each Spark task. The drained
    (partition, offset, value) set is regenerated exactly by the oracle's
    closed form. Keyed crc32 routing, concurrent consumer groups, and
    restart exactly-once are pinned in tests/test_wire_multipartition.py;
    ``sf_dir`` unused (the source is the broker)."""
    from pyspark.sql import functions as F

    from ..sources.items_source import item_name_for
    from ..sources.wire_source import register as register_wire
    from ..streaming.ingest import run_to_memory
    from ..streaming.wirebroker import WireBroker, WireClient

    broker = WireBroker()
    host, port = broker.start()
    try:
        with WireClient(host, port) as client:
            client.create_topic("items_mp", _WMP_PARTS)
            for i in range(_WMP_N):
                client.produce_part("items_mp", i % _WMP_PARTS, item_name_for(i))
        register_wire(spark)
        stream = (
            spark.readStream.format("wire_topic")
            .option("host", host)
            .option("port", port)
            .option("topic", "items_mp")
            .option("group", "parity-mp")
            .option("maxRowsPerPartition", 64)
            .load()
        )
        out = run_to_memory(stream)
        return out.select(
            "partition",
            F.col("offset").alias("msg_offset"),
            F.col("value").alias("item_name"),
        )
    finally:
        broker.stop()
