"""Query registry: name → Spark callable (+ optional DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers here. The driver runs the
Spark callable and the oracle SQL side-by-side and compares row count, schema
and an order-insensitive value hash — so registered pairs must agree on
column NAMES and exact VALUES.

Float-exactness discipline (used throughout the query modules): aggregate
sums over doubles are order-dependent in IEEE arithmetic, so any SUM/AVG that
feeds the oracle hash is computed in exact DECIMAL (associative, order-free)
and cast to double once at the end — identical bits in Spark and DuckDB
regardless of partitioning. See ``functions.parity``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent ANSI SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (streaming,
    external-I/O, iterative) — the driver then applies its weaker rows-only
    check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
