"""Streaming tests (SURVEY.md §5.2 item 5): file sources + AvailableNow +
memory sink — dedup, windows/watermark, and checkpoint-resume (the
exactly-once property replacing the reference's mark-processed mutation,
`pipeline.py:144-150`).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.ingest import (
    dedup_stream,
    read_events_stream,
    run_to_memory,
)
from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _write_batch(spark, tmp_path, rows, name):
    path = str(tmp_path / name)
    spark.createDataFrame(
        rows, "item_name string, ingestion_ts timestamp, data string"
    ).coalesce(1).write.mode("append").parquet(path)
    return path


def test_stream_matches_batch_tumbling(spark):
    """Hybrid parity: streaming tumbling agg == batch date-bucket agg."""
    stream = read_events_stream(spark, SF)
    got = run_to_memory(tumbling_counts(stream), output_mode="complete")
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("event_cnt"))
    )
    got_map = {r.bucket_start: r.event_cnt for r in got.collect()}
    exp_map = {
        r.w.start.replace(tzinfo=None): r.event_cnt for r in batch.collect()
    }
    assert got_map == exp_map


def test_stream_dedup_bounded_state(spark):
    stream = read_events_stream(spark, SF).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = run_to_memory(dedup_stream(stream, ["user_id"], watermark=("ts", "30 days")))
    rows = out.collect()
    # one row per user, and every user present
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    )
    assert len(users) == n_users


def test_sliding_and_session_windows_run(spark):
    stream = read_events_stream(spark, SF)
    slid = run_to_memory(sliding_counts(stream), output_mode="complete")
    # every event lands in 2 sliding buckets (2h window, 1h slide)
    total_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.event_cnt for r in slid.collect()) == 2 * total_events

    stream2 = read_events_stream(spark, SF)
    sess = run_to_memory(session_windows(stream2), output_mode="complete")
    srows = sess.collect()
    assert sum(r.event_cnt for r in srows) == total_events
    assert all(r.session_end > r.session_start for r in srows)


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """Process a micro-batch, stop, add data, resume from the checkpoint:
    no duplicates, no losses (T3/S6 — the reference's at-least-once commit
    loop + racy mark-processed, done right)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, tmp_path, [(f"item{i}", ts, "{}") for i in range(5)], "src")

    schema = "item_name string, ingestion_ts timestamp, data string"

    def run_once():
        # File sink (memory sink does not support checkpoint recovery) —
        # the production shape: stream → checkpointed columnar append.
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.item_name for r in spark.read.parquet(out).collect())

    assert run_once() == [f"item{i}" for i in range(5)]

    # new file arrives; the resumed query must process ONLY the new rows —
    # total output stays duplicate-free across restarts.
    _write_batch(spark, tmp_path, [(f"item{i}", ts, "{}") for i in range(5, 8)], "src")
    assert run_once() == [f"item{i}" for i in range(8)]


def test_rate_limited_ingestion(spark):
    """maxFilesPerTrigger bounds per-micro-batch work (T1/T2 — the
    reference's sleep-paced loops, `produce_items.py:66`,
    `consume_items.py:108`)."""
    stream = read_events_stream(spark, SF, max_files_per_trigger=1)
    out = run_to_memory(stream.groupBy().count(), output_mode="complete")
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert out.collect()[0]["count"] == total


def test_foreachbatch_upsert_lww(spark, tmp_path):
    """foreachBatch keyed upsert (S4): streaming merge equals the batch
    last-write-wins dedup of all input."""
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.upsert_sink import (
        ParquetUpsertStore,
        upsert_stream,
    )

    src = str(tmp_path / "src")
    ts0 = datetime.datetime(2024, 1, 1)
    rows1 = [("a", ts0, "v1"), ("b", ts0, "v1")]
    _write_batch(spark, tmp_path, rows1, "src")
    store = ParquetUpsertStore(
        spark, str(tmp_path / "store"), key="item_name", ts_col="ingestion_ts"
    )
    schema = "item_name string, ingestion_ts timestamp, data string"

    q = upsert_stream(
        spark.readStream.schema(schema).parquet(src), store, str(tmp_path / "ck")
    )
    q.awaitTermination()
    # Later write for 'a', new key 'c'.
    rows2 = [("a", ts0 + datetime.timedelta(hours=1), "v2"), ("c", ts0, "v1")]
    _write_batch(spark, tmp_path, rows2, "src")
    q = upsert_stream(
        spark.readStream.schema(schema).parquet(src), store, str(tmp_path / "ck")
    )
    q.awaitTermination()

    final = {r.item_name: r.data for r in store.read().collect()}
    assert final == {"a": "v2", "b": "v1", "c": "v1"}


def test_upsert_store_rewrites_only_touched_buckets(spark, tmp_path):
    """The bucketed store's merge must be O(micro-batch), not O(store):
    buckets the batch doesn't touch keep byte-identical files."""
    import hashlib
    import os

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.upsert_sink import (
        ParquetUpsertStore,
    )

    def snapshot(path):
        state = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    state[os.path.relpath(p, path)] = hashlib.md5(fh.read()).hexdigest()
        return state

    store = ParquetUpsertStore(
        spark, str(tmp_path / "store"), key="item_name", ts_col="ingestion_ts",
        n_buckets=8,
    )
    ts0 = datetime.datetime(2024, 1, 1)
    seed = spark.createDataFrame(
        [(f"item{i}", ts0, "v1") for i in range(40)],
        "item_name string, ingestion_ts timestamp, data string",
    )
    store.merge(seed)
    before = snapshot(store.path)
    n_buckets_before = len(store._live_buckets())
    assert n_buckets_before > 1  # the point of the test needs >1 bucket

    update = spark.createDataFrame(
        [("item0", ts0 + datetime.timedelta(hours=1), "v2")],
        "item_name string, ingestion_ts timestamp, data string",
    )
    store.merge(update)
    after = snapshot(store.path)

    changed_dirs = {
        os.path.dirname(p)
        for p in (set(before) ^ set(after))
        | {p for p in before if p in after and before[p] != after[p]}
        if os.path.dirname(p).startswith("bucket=")
    }
    assert len(changed_dirs) == 1, f"expected 1 touched bucket, got {changed_dirs}"

    final = {r.item_name: r.data for r in store.read().collect()}
    assert final["item0"] == "v2"
    assert len(final) == 40


def test_upsert_store_read_raises_on_corrupt_store(spark, tmp_path):
    """A readable-but-broken store must surface the error, never be treated
    as empty (which would let the next merge overwrite all history)."""
    import os

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.upsert_sink import (
        ParquetUpsertStore,
    )

    store = ParquetUpsertStore(
        spark, str(tmp_path / "store"), key="item_name", ts_col="ingestion_ts"
    )
    assert store.read() is None  # genuinely absent → None

    bucket_dir = tmp_path / "store" / "bucket=0"
    os.makedirs(bucket_dir)
    (bucket_dir / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        store.read().collect()
