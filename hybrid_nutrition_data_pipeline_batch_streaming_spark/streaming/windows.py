"""Event-time windowed aggregation with watermarks (SURVEY.md §2.9 T6).

Absent from the reference (its streaming layer has no event-time ops); part
of the north star's "Structured Streaming hybrid". Watermarks bound state:
a window closes once the watermark passes its end, so state size tracks the
late-data allowance, not the stream length — the 100 TB/day requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parity import MONEY


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window: count + exact-decimal value sum.

    Emits (bucket_start, event_cnt, total_value) — the same grouping as the
    batch analog ``plans.windows.stream_tumbling``, so batch and stream
    answers are comparable (the hybrid-parity property).
    """
    # Watermark/window need TimestampType; convert back to NTZ for output
    # parity (session tz is pinned UTC by the engine).
    e = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    return (
        e.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window_len).alias("w"))
        .agg(
            F.count("*").alias("event_cnt"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
            "event_cnt",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding window variant (each event lands in window_len/slide buckets)."""
    e = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    return (
        e.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window_len, slide).alias("w"))
        .agg(F.count("*").alias("event_cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
            "event_cnt",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows keyed by user: a session closes after ``gap`` of
    inactivity — per-key variable-length state, bounded by the watermark."""
    e = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    return (
        e.withWatermark("__ts", watermark)
        .groupBy(F.session_window("__ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("event_cnt"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "event_cnt",
        )
    )


def tumbling_type_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) counts — the streaming half of windowed
    heavy-hitters: the stream maintains one counter per (bucket, type)
    pair (state linear in buckets × |type| domain, watermark-bounded);
    the top-k RANKING over the drained result is a batch finish, because
    a rank is only final once the window closes."""
    e = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    return (
        e.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window_len).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
            "event_type",
            "cnt",
        )
    )
