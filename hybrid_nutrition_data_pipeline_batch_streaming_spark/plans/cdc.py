"""CDC / slowly-changing-dimension queries (SURVEY.md §2 S4/S6 extension).

``operators/scd.py`` implements the MERGE-INTO-equivalent SCD2 merge as
three joins over one shuffle key; until now it was exercised only by unit
tests. ``scd2_history`` runs it on fixture-derived deterministic inputs and
value-checks the ENTIRE merged history against a DuckDB oracle that replays
the same merge in SQL — the strongest check the harness supports, covering
the LWW pre-reduce, the close-out stamping, the anti-join passthrough, and
the brand-new-key insert in one result.

Reference parity: the reference's Cassandra upsert keeps only latest state
(`consumer/consume_items.py:50-58`); SCD2 is the history-preserving variant
its BI layer (ClickHouse `nutrition_mv`) would need for as-of analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.scd import scd2_apply
from .registry import query

_EPOCH = "1990-01-01 00:00:00"


@query(
    "scd2_history",
    oracle=f"""
    WITH hist AS (
        SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
               TIMESTAMP '{_EPOCH}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ), upd0 AS (
        SELECT o_custkey AS k, o_orderpriority AS seg, o_totalprice AS bal,
               o_orderdate AS uts
        FROM orders
    ), upd AS (
        SELECT k, seg, bal, uts FROM (
            SELECT k, seg, bal, uts,
                   ROW_NUMBER() OVER (PARTITION BY k
                                      ORDER BY uts DESC, seg DESC, bal DESC)
                       AS rn
            FROM upd0
        ) WHERE rn = 1
    ), changed AS (
        SELECT u.k, u.seg, u.bal, u.uts
        FROM upd u LEFT JOIN hist c ON c.k = u.k
        WHERE c.k IS NULL
           OR u.seg IS DISTINCT FROM c.seg
           OR u.bal IS DISTINCT FROM c.bal
    )
    SELECT c.k, c.seg, c.bal, c.valid_from, ch.uts AS valid_to
    FROM hist c JOIN changed ch ON ch.k = c.k          -- closed-out rows
    UNION ALL
    SELECT c.k, c.seg, c.bal, c.valid_from, c.valid_to
    FROM hist c ANTI JOIN changed ch ON ch.k = c.k     -- untouched rows
    UNION ALL
    SELECT k, seg, bal, uts AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM changed                                        -- new open versions
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge, value-checked end-to-end: the customer table seeds the
    dimension history (one open version per key, effective {_EPOCH}); each
    customer's LATEST order (LWW on o_orderdate, tracked-column tiebreak)
    proposes new (segment, balance) values. Changed keys get their open row
    closed at the update timestamp and a new open version appended;
    unchanged and orderless customers pass through untouched.

    Scale shape (see operators/scd.py): every join — LWW window, change
    detection, close-out, anti-join passthrough — shares the dimension key,
    so the whole merge is one co-partitioned shuffle; with Delta/Iceberg the
    same logical plan ships as MERGE INTO.
    """
    cat = Catalog(spark, sf_dir)
    history = cat.customer.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.lit(_EPOCH).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    updates = cat.orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").alias("bal"),
        F.col("o_orderdate").alias("update_ts"),
    )
    return scd2_apply(
        history,
        updates,
        key="k",
        tracked=["seg", "bal"],
        effective_ts="valid_from",
        end_ts="valid_to",
    )


@query(
    "join_temporal_scd2",
    oracle=f"""
    WITH hist AS (
        SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
               TIMESTAMP '{_EPOCH}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ), upd0 AS (
        SELECT o_custkey AS k, o_orderpriority AS seg, o_totalprice AS bal,
               o_orderdate AS uts
        FROM orders
    ), upd AS (
        SELECT k, seg, bal, uts FROM (
            SELECT k, seg, bal, uts,
                   ROW_NUMBER() OVER (PARTITION BY k
                                      ORDER BY uts DESC, seg DESC, bal DESC)
                       AS rn
            FROM upd0
        ) WHERE rn = 1
    ), changed AS (
        SELECT u.k, u.seg, u.bal, u.uts
        FROM upd u LEFT JOIN hist c ON c.k = u.k
        WHERE c.k IS NULL
           OR u.seg IS DISTINCT FROM c.seg
           OR u.bal IS DISTINCT FROM c.bal
    ), scd AS (
        SELECT c.k, c.seg, c.valid_from, ch.uts AS valid_to
        FROM hist c JOIN changed ch ON ch.k = c.k
        UNION ALL
        SELECT c.k, c.seg, c.valid_from, c.valid_to
        FROM hist c ANTI JOIN changed ch ON ch.k = c.k
        UNION ALL
        SELECT k, seg, uts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        FROM changed
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           d.seg,
           (d.k IS NOT NULL AND d.valid_to IS NULL) AS is_current
    FROM events e LEFT JOIN scd d
      ON d.k = e.user_id
     AND CAST(e.ts AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < d.valid_to)
    """,
)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join — THE warehouse pattern SCD2 history exists
    for: each event joins the dimension VERSION that was valid at the
    event's own timestamp (valid_from <= ts < valid_to, open versions
    unbounded), never the current row. Composes the value-checked SCD2
    merge (scd2_history) with a versioned-interval join; events at an
    exact version boundary land in the newer version on both engines
    (close-out is exclusive, effective_ts inclusive), and events with no
    dimension row keep a NULL segment rather than dropping.

    Shape for 100 TB: the dimension history stays dimension-sized (2
    versions/key max here) → broadcast; the join is equi on the key with
    the interval as a residual filter, so the fact side streams through a
    BroadcastHashJoin — no shuffle, no range explosion."""
    cat = Catalog(spark, sf_dir)
    hist = scd2_history(spark, sf_dir).select("k", "seg", "valid_from", "valid_to")
    ts = F.col("ts").cast("timestamp_ntz")
    return (
        cat.events.join(
            F.broadcast(hist),
            (F.col("k") == F.col("user_id"))
            & (ts >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (ts < F.col("valid_to"))),
            "left",
        )
        .select(
            "event_id",
            "user_id",
            ts.alias("ts"),
            "seg",
            (F.col("k").isNotNull() & F.col("valid_to").isNull()).alias(
                "is_current"
            ),
        )
    )
