"""Window functions + time bucketing (SURVEY.md §2.5 W1–W4, §2.9 T6 analog).

The reference's only ordered-data semantics are the Cassandra last-write-wins
upsert (`consume_items.py:53,102-103`) and MergeTree ORDER BY
(`pipeline.py:105-107`); W1 re-expresses the former declaratively. All window
specs carry a unique tiebreaker column so results are deterministic under any
partitioning — the property that keeps reruns idempotent at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..functions.parity import MONEY
from .registry import query


@query(
    "dedup_last_write",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM (
        SELECT user_id, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_last_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins dedup by key (W1/S4): the Cassandra PK-upsert
    semantics (`consume_items.py:53,102-103`) as row_number over
    (key, desc ts). One shuffle on the key; at 100 TB this is the standard
    "latest record per key" compaction pattern."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        cat.events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


@query(
    "window_lag",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           LAG(CAST(ts AS TIMESTAMP)) OVER w  AS prev_ts,
           LEAD(CAST(ts AS TIMESTAMP)) OVER w AS next_ts,
           LAG(value) OVER w                  AS prev_value,
           FIRST_VALUE(value) OVER wf         AS first_value_seen,
           LAST_VALUE(value) OVER wf          AS final_value,
           NTH_VALUE(value, 2) OVER wf        AS second_value
    FROM events
    WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
           wf AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic navigation functions over per-user event time (W2): lag/lead
    plus first/last/nth over the full-partition frame. Both window specs
    share the (user_id) partitioning, so Catalyst computes them over ONE
    shuffle/sort; `window_first_last` stays registered as the standalone
    variant."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cat.events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.lag("value").over(w).alias("prev_value"),
        F.first("value").over(wf).alias("first_value_seen"),
        F.last("value").over(wf).alias("final_value"),
        F.nth_value("value", 2).over(wf).alias("second_value"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY value
                RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS nearby_value_sum
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windowed aggregates (W3), decimal-exact: a ROWS running
    sum over event time plus a RANGE frame over the value domain (all
    events within 100 below the current value). Both windows partition by
    user_id — the scale-safe form: no global-order single-task window
    anywhere in the plan."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("value")
        .rangeBetween(-100, Window.currentRow)
    )
    return cat.events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(MONEY)).over(w).cast("double").alias("running_value"),
        F.sum(F.col("value").cast(MONEY)).over(wr).cast("double").alias(
            "nearby_value_sum"
        ),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS bal_quartile,
           CAST(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS bal_pct_rank
    FROM customer
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile banding (W4): ntile/percent_rank — the "calorie quartiles"
    style dashboard cut."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cat.customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_value_seen,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_value,
           NTH_VALUE(value, 2) OVER w AS second_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth analytic values over the full partition frame (W2
    family): per-user first-seen, final and second event values."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cat.events.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w).alias("final_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS nearby_price_sum
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windowed aggregate (W3 variant): value-based frame bounds
    (all same-priority orders within $1000 below the current price),
    decimal-exact. Partitioned by o_orderpriority so the window never
    degenerates into a single global-order task — the scale-safe form."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return cat.orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast(MONEY)).over(w).cast("double").alias(
            "nearby_price_sum"
        ),
    )


@query(
    "sessionize_batch",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           COUNT(*) AS event_cnt,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (the batch twin of
    streaming/windows.py::session_windows): lag → gap flag → running sum
    assigns session ids, then per-session aggregates — two window passes
    over ONE shuffle on user_id (the partitioning is reused across both
    windows and the final groupBy)."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gaps (a seconds-truncated cast would round each
    # endpoint before differencing and disagree with the oracle near the
    # 30-minute boundary).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    tagged = cat.events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("session_id"),
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("event_cnt"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "stream_tumbling",
    oracle="""
    SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                          * 3600000000) AS bucket_start,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window, batch analog (T6): 1-hour buckets over
    events — identical grouping to `groupBy(window("ts", "1 hour"))` in the
    streaming module (streaming/windows.py carries the watermark variant);
    expressed via epoch arithmetic so DuckDB computes the same buckets."""
    cat = Catalog(spark, sf_dir)
    bucket_us = 3_600_000_000
    bucket = F.timestamp_micros(
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.col("ts").cast("timestamp")) % bucket_us)
    ).cast("timestamp_ntz")
    return (
        cat.events.groupBy(bucket.alias("bucket_start"))
        .agg(
            F.count("*").alias("event_cnt"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
        )
    )


@query(
    "window_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CUME_DIST() OVER w AS price_cume,
           PERCENT_RANK() OVER w AS price_pct_rank,
           CAST(RANK() OVER w AS BIGINT) AS price_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position analytics (W4 completion): CUME_DIST (fraction
    of the partition at-or-below this price), PERCENT_RANK and RANK per
    order-priority band. All three are pure rank arithmetic — value ties get
    identical positions in every engine, so doubles hash exactly (each is
    one integer-over-integer division). One window exchange on the
    partition key."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return cat.orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.cume_dist().over(w).alias("price_cume"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.rank().over(w).cast("long").alias("price_rank"),
    )
