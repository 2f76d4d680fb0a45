"""Bucket-occupancy-capped blocking self-join — the shared pair-generation
scale lever for every banded/bucketed candidate generator.

Motivation (round-5 M=100 scale study, SCALE.md): any blocking scheme with a
FIXED key space — sign-LSH bands, minhash band buckets, content buckets —
fills linearly with the corpus, so the bucket self-join's pair volume grows
QUADRATICALLY. Measured: one 4-bit sign bucket held 38 806 vectors at
M=100 (~7.5e8 pairs from a single bucket; the uncapped query never
finished), and the minhash band buckets grew 8 → 508 occupancy from sf0.1
to M=100 on the same linear trajectory. A bucket that dense carries no
similarity signal — a meaningful fraction of the corpus sharing one band
key means the band does not discriminate — so dropping it is the standard
LSH blocking lever (FAISS caps probe lists the same way; PPJoin's prefix
filter bounds the same quantity structurally).

This module factors the lever implemented ad hoc twice in round 5
(``plans/similarity.py`` dedup_embedding's per-band census,
``plans/graph.py`` graph_jaccard_sim's hub-bag filter) into ONE operator +
its oracle-mirroring SQL fragment, so every pair generator states the cap
the same way and the DuckDB oracle mirrors it bit-for-bit.

Plan shape (per band): one partial-aggregated census shuffle over the band
key (output ≤ |distinct keys| rows — broadcastable by construction), a
broadcast semi-filter of the left side, then ONE equi-join on the band key
with the ordered-id predicate applied at the join. No sort, no window, no
driver collect; survives any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_blocking_join(
    df: DataFrame,
    band_cols: Sequence[str],
    id_col: str,
    cap: int,
    out_a: str = "id_a",
    out_b: str = "id_b",
) -> DataFrame:
    """Ordered candidate pairs (``out_a`` < ``out_b``) from an equi-self-join
    of ``df`` on ``band_cols``, with buckets above ``cap`` occupancy dropped.

    The occupancy census is tiny relative to ``df`` (one row per distinct
    band key) and is broadcast, so the cap adds one map-side aggregate and
    zero extra shuffles of the corpus. Callers union the per-band outputs
    and ``distinct()`` for OR-amplified banding.
    """
    band_cols = list(band_cols)
    ok = (
        df.groupBy(*band_cols)
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") <= cap)
        .drop("occ")
    )
    lhs = df.select(*band_cols, F.col(id_col).alias(out_a)).join(
        F.broadcast(ok), band_cols
    )
    rhs = df.select(
        *[F.col(c).alias(f"__rhs_{c}") for c in band_cols],
        F.col(id_col).alias(out_b),
    )
    cond = F.col(out_a) < F.col(out_b)
    for c in band_cols:
        cond = (F.col(c) == F.col(f"__rhs_{c}")) & cond
    return lhs.join(rhs, cond).select(out_a, out_b)


def capped_pair_sql(
    base: str,
    band_cols: Sequence[str],
    id_col: str,
    cap: int,
    out_a: str = "id_a",
    out_b: str = "id_b",
) -> str:
    """The DuckDB oracle fragment mirroring :func:`capped_blocking_join`
    exactly — a HAVING census join-filtered into the bucket self-join. One
    fragment per band; callers UNION them."""
    band_cols = list(band_cols)
    keys = ", ".join(band_cols)
    ok = "".join(c[0] for c in band_cols) + "_ok"
    ok_on = " AND ".join(f"{ok}.{c} = a.{c}" for c in band_cols)
    on = " AND ".join(f"a.{c} = b.{c}" for c in band_cols)
    return (
        f"        SELECT a.{id_col} AS {out_a}, b.{id_col} AS {out_b}\n"
        f"        FROM {base} a\n"
        f"        JOIN (SELECT {keys} FROM {base} GROUP BY {keys}\n"
        f"              HAVING COUNT(*) <= {cap}) {ok} ON {ok_on}\n"
        f"        JOIN {base} b ON {on} AND a.{id_col} < b.{id_col}"
    )
