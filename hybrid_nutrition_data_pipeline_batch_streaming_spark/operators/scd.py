"""Slowly-changing-dimension (SCD2) merge — CDC without a lakehouse format.

The reference's raw layer overwrites history (Cassandra LWW upsert,
`consume_items.py:53,102-103`); an analytics engine also needs the
history-preserving variant. With Delta/Iceberg this is ``MERGE INTO``; on
plain columnar storage the same semantics compose from three joins over one
shuffle key:

    changed   = updates ⋈ current        (tracked columns differ)
    closed    = current ⋈ changed-keys   (stamp valid_to)
    untouched = current ⟕̸ changed-keys  (anti-join)
    result    = untouched ∪ closed ∪ new-versions ∪ brand-new-keys

All joins share the dimension key, so at scale this is one co-partitioned
pass; rewrite atomicity comes from the staging-dir swap (sources/writers) or
a table format in production.
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
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(
        F.desc(update_ts_col), *[F.desc(t) for t in tracked]
    )
    updates = (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    current = history.where(F.col(end_ts).isNull())
    closed_history = history.where(F.col(end_ts).isNotNull())

    def differs() -> Column:
        parts = [
            ~F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}")) for c in tracked
        ]
        return reduce(lambda a, b: a | b, parts)

    u, c = updates.alias("u"), current.alias("c")
    joined = u.join(c, F.col(f"u.{key}") == F.col(f"c.{key}"), "left")

    # New open versions: changed rows + brand-new keys.
    new_versions = joined.where(F.col(f"c.{key}").isNull() | differs()).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{t}").alias(t) for t in tracked],
        F.col(f"u.{update_ts_col}").alias(effective_ts),
        F.lit(None).cast("timestamp_ntz").alias(end_ts),
    )
    changed_keys = new_versions.where(F.col(effective_ts).isNotNull()).select(
        F.col(key), F.col(effective_ts).alias("__close_ts")
    )

    # Close out the superseded current rows.
    closed_now = (
        current.join(changed_keys, key, "inner")
        .withColumn(end_ts, F.col("__close_ts"))
        .drop("__close_ts")
    )
    untouched = current.join(changed_keys.select(key), key, "left_anti")

    cols = [key, *tracked, effective_ts, end_ts]
    return (
        closed_history.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(closed_now.select(*cols))
        .unionByName(new_versions.select(*cols))
    )
