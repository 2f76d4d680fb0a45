"""Skew-mitigation utilities (SURVEY.md §4.2; the "salting for skew" lever).

AQE's skew-join splitting handles most sort-merge skew automatically
(enabled in session.py); these helpers cover the cases AQE can't re-plan:

- ``salted_join``: replicate the small side R ways and scatter the skewed
  big-side keys across R salt buckets, so one hot key (the celebrity-user /
  empty-string pathology of web-scale training data) spreads over R tasks
  instead of stalling one straggler.
- ``two_phase_agg``: explicit partial aggregation over a salted key for
  high-cardinality-resistant combiners where a single hot group dominates.

Both preserve exact semantics — tests assert equality with the unsalted
plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side.

    big gains a random-ish (but deterministic: hash of all columns) salt in
    [0, n_salts); small is exploded n_salts×; the join key becomes
    (key, salt). Exact same rows as ``big.join(small, key)`` — only the
    partitioning changes.

    Only ``how`` in {'inner', 'left'} preserves that row-equivalence: with
    the small side exploded n_salts×, any join that can emit UNMATCHED
    small-side rows ('right'/'full'/'left_semi' from small's perspective…)
    would emit each of them once per salt. Other modes raise rather than
    silently multiply rows.

    Limitation (documented, inherent to a deterministic salt): rows on the
    big side that are bit-identical across ALL columns hash to the same salt
    bucket and are not spread; dedup first, or add a disambiguating column
    (e.g. a file/offset id) if fully-duplicate hot rows are the skew source.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "exploded small side would replicate unmatched small-side rows "
            f"{n_salts}x under outer/semi modes"
        )
    salt = F.pmod(F.xxhash64(*[big[c] for c in big.columns]), F.lit(n_salts)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key).agg(...) via an explicit salted partial phase.

    ``agg_exprs`` maps column → 'sum'|'count'|'min'|'max' (the algebraic
    combiners that re-aggregate cleanly). Phase 1 aggregates (key, salt);
    phase 2 merges the ≤ n_salts partials per key — the hot group's work is
    spread across n_salts tasks.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in agg_exprs.items()]
    )
    phase2 = phase1.groupBy(key).agg(
        *[
            getattr(F, merge_fn[fn])(f"__p_{c}").alias(f"{fn}_{c}")
            for c, fn in agg_exprs.items()
        ]
    )
    return phase2


def null_split_left_join(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """Left equi-join with NULL-key rows routed AROUND the shuffle.

    Null keys are the degenerate hot key: every NULL-keyed left row hashes
    to one partition, shuffles there, and then matches nothing anyway (SQL
    equi-joins never match on NULL). Web-scale fact tables routinely carry
    10-40% NULL foreign keys (optional dimensions), so this one straggler
    partition can dominate an otherwise balanced join. The fix is
    structural, not statistical: split the left side on ``key IS NULL``,
    join only the non-null slice, and union the NULL slice back with the
    right-side columns as literal NULLs — semantically identical to the
    plain left join (tests pin row-level equality) while the NULL rows
    never enter an exchange.

    AQE's skew splitting cannot express this (it still shuffles the rows;
    it only splits the oversized partition); routing around the join is
    strictly cheaper. Right-side column types are taken from the right
    schema so the union stays by-name and cast-exact.

    Precondition (asserted): ``key`` is the ONLY column name the two
    sides share. Overlapping non-key names would make the plain left
    join ambiguous and would collapse in ``dict(right.dtypes)``.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap != {key}:
        raise ValueError(
            "null_split_left_join requires the join key to be the only "
            f"shared column name; got overlap {sorted(overlap)} (key={key!r})"
        )
    right_cols = [c for c in right.columns if c != key]
    matched = left.filter(F.col(key).isNotNull()).join(right, key, "left")
    nulls = left.filter(F.col(key).isNull()).select(
        # `key` first to mirror Spark's left-join column order (key, then
        # remaining left columns, then right columns).
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(c)
            for c in right_cols
        ],
    )
    return matched.unionByName(nulls)
