"""Skew-mitigation queries (SURVEY.md §4.2): the operators/skew.py levers
exercised as registered, oracle-checked queries.

Both operators are exact-semantics rewrites — salting changes WHERE rows
meet, never WHICH rows meet — so each oracle is simply the unsalted plan in
SQL: any row divergence introduced by the salt plumbing (bad explode range,
salt-column leakage, partial/merge mismatch) fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.skew import salted_join, two_phase_agg
from .registry import query

N_SALTS = 8


@query(
    "join_salted",
    oracle="""
    SELECT l.l_orderkey, l.suppkey, l.l_extendedprice, s.s_name
    FROM (SELECT l_orderkey, l_suppkey AS suppkey, l_extendedprice
          FROM lineitem) l
    JOIN (SELECT s_suppkey AS suppkey, s_name FROM supplier) s
      USING (suppkey)
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (§4.2): the big side scatters each key across
    {N_SALTS} salt buckets (deterministic row hash), the small side is
    exploded {N_SALTS}×, and the join runs on (key, salt) — one hot key's
    rows spread over {N_SALTS} tasks instead of stalling one straggler.
    Row-for-row identical to the plain join, which is exactly what the
    oracle checks. On this fixture the exploded supplier side still fits
    under the broadcast threshold; the salting pays off at the scale where
    the small side is too big to broadcast but the big side has celebrity
    keys — the plan shape is the same either way."""
    cat = Catalog(spark, sf_dir)
    big = cat.lineitem.select(
        "l_orderkey", F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    small = cat.supplier.select(F.col("s_suppkey").alias("suppkey"), "s_name")
    return salted_join(big, small, "suppkey", n_salts=N_SALTS).select(
        "l_orderkey", "suppkey", "l_extendedprice", "s_name"
    )


@query(
    "agg_two_phase",
    oracle="""
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(l_orderkey) AS count_l_orderkey,
           MAX(l_extendedprice) AS max_l_extendedprice
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def agg_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase (salted) aggregation (§4.2): phase 1 aggregates
    (key, salt) so a hot group's combine work spreads over {N_SALTS}+ tasks;
    phase 2 merges the bounded per-key partials. Only algebraic combiners
    re-aggregate cleanly — and the summed metric is decimal-exact, so the
    salted partial/merge order cannot perturb the result vs the one-phase
    oracle (a double sum would make this comparison order-dependent)."""
    cat = Catalog(spark, sf_dir)
    df = cat.lineitem.select(
        "l_suppkey",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        "l_orderkey",
        "l_extendedprice",
    )
    out = two_phase_agg(
        df,
        "l_suppkey",
        {"qty": "sum", "l_orderkey": "count", "l_extendedprice": "max"},
        n_salts=16,
    )
    return out.select(
        "l_suppkey",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "count_l_orderkey",
        "max_l_extendedprice",
    )
