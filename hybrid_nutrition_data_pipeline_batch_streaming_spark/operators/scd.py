"""Slowly-changing-dimension (SCD2) merge — CDC without a lakehouse format.

The reference's raw layer overwrites history (Cassandra LWW upsert,
`consume_items.py:53,102-103`); an analytics engine also needs the
history-preserving variant. With Delta/Iceberg this is ``MERGE INTO``; on
plain columnar storage the same semantics come from ONE full-outer join of
the history with the (LWW-pre-reduced) updates on the dimension key,
followed by a single explode-of-structs pass that emits, per joined row:

    closed history row            → itself, untouched
    current row, no/equal update  → itself, untouched
    current row, differing update → (close-out row, new open version)
    update with no history at all → new open version

Earlier rounds built the same result from four join/anti-join legs over a
shared ``current`` frame; that shape scans each base table twice (SCALE.md
round-9 rescan audit). The fused form scans history and updates exactly
once and keeps everything on one shuffle key; rewrite atomicity comes from
the staging-dir swap (sources/writers) or a table format in production.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_ts: str = "valid_from",
    end_ts: str = "valid_to",
    update_ts_col: str = "update_ts",
) -> DataFrame:
    """Merge ``updates`` into an SCD2 ``history`` table.

    ``history`` carries (key, tracked..., valid_from, valid_to) with
    ``valid_to IS NULL`` marking current rows. ``updates`` carries
    (key, tracked..., update_ts). Returns the new history: changed keys get
    their current row closed at update_ts and a new open version appended;
    unchanged/unknown keys pass through untouched.

    A batch may carry several updates for one key (CDC replays do); they are
    pre-reduced to the LATEST row per key (last-write-wins on update_ts,
    tracked columns as a deterministic tiebreaker) before merging —
    otherwise each differing update would open its own version and the
    superseded current row would be closed once per update, corrupting
    history with overlapping/duplicate rows (a Delta ``MERGE INTO`` would
    instead fail on multiple matches). Intermediate same-batch versions are
    intentionally not preserved, matching LWW upsert semantics.

    Scale shape: history and updates are each scanned ONCE; the merge is a
    single full-outer equi-join on the key plus key-partitioned windows that
    reuse the join's hash partitioning, so the whole merge stays one
    co-partitioned pass. A key whose versions are ALL closed (no open row)
    treats an incoming update as a brand-new insert — the same behavior the
    original anti-join formulation had — via the per-key ``has_current``
    window flag.
    """
    from pyspark.sql.window import Window

    lww = Window.partitionBy(key).orderBy(
        F.desc(update_ts_col), *[F.desc(t) for t in tracked]
    )
    updates = (
        updates.withColumn("__rn", F.row_number().over(lww))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    c, u = history.alias("c"), updates.alias("u")
    ckey, ukey = F.col(f"c.{key}"), F.col(f"u.{key}")
    joined = c.join(u, ckey == ukey, "full").withColumn(
        "__k", F.coalesce(ckey, ukey)
    )

    is_current = ckey.isNotNull() & F.col(f"c.{end_ts}").isNull()
    # Per-key bookkeeping for the closed-only-key edge: the update must be
    # inserted exactly once even though it joined several closed rows.
    wk = Window.partitionBy("__k")
    wo = Window.partitionBy("__k").orderBy(
        F.col(f"c.{effective_ts}").asc_nulls_first()
    )
    joined = joined.withColumn(
        "__has_cur", F.max(is_current.cast("int")).over(wk)
    ).withColumn("__pick", F.row_number().over(wo))

    def differs() -> Column:
        parts = [
            ~F.col(f"u.{c_}").eqNullSafe(F.col(f"c.{c_}")) for c_ in tracked
        ]
        return reduce(lambda a, b: a | b, parts)

    def emit(key_side: str, ts_from: Column, ts_to: Column) -> Column:
        return F.struct(
            F.col(f"{key_side}.{key}").alias(key),
            *[F.col(f"{key_side}.{t}").alias(t) for t in tracked],
            ts_from.alias(effective_ts),
            ts_to.alias(end_ts),
        )

    uts = F.col(f"u.{update_ts_col}")
    c_asis = emit("c", F.col(f"c.{effective_ts}"), F.col(f"c.{end_ts}"))
    c_closed = emit("c", F.col(f"c.{effective_ts}"), uts)
    new_version = emit("u", uts, F.lit(None).cast("timestamp_ntz"))

    # A NULL update_ts never closes the current row (it is outside the
    # timeline) but the differing tracked values still open a new version —
    # matching the pre-fusion changed-keys filter on effective_ts.
    close_or_keep = F.when(uts.isNotNull(), c_closed).otherwise(c_asis)

    rows = (
        F.when(ckey.isNull(), F.array(new_version))  # brand-new key
        .when(
            is_current & ukey.isNotNull() & differs(),
            F.array(close_or_keep, new_version),
        )
        .when(  # key has an update but only closed versions: insert once
            ukey.isNotNull() & (F.col("__has_cur") == 0) & (F.col("__pick") == 1),
            F.array(c_asis, new_version),
        )
        .otherwise(F.array(c_asis))
    )
    return joined.select(F.explode(rows).alias("__r")).select("__r.*")
