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

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: Nesting depth of query invocations — composite plans invoke other
#: registered queries as building blocks (e.g. graph_jaccard_sim consumes
#: dedup_minhash_banded), and the cache release below must fire only at the
#: TOP-level entry: clearing mid-build would drop frames the outer plan has
#: already persisted. Single-threaded by the harness contract.
_DEPTH = 0


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent ANSI SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (streaming,
    external-I/O, iterative) — the driver then applies its weaker rows-only
    check.

    Each registered callable is wrapped so that a TOP-LEVEL invocation first
    releases the caches left behind by the previous query
    (``session.release_caches`` — ADVICE r7: plan functions persist
    intermediates their callers materialize later, so the release point is
    the start of the NEXT query, by which time the prior result has been
    consumed). This bounds a long-lived session's storage to one query's
    working set without forfeiting intra-query single-scan caching.

    CONTRACT (ADVICE r8): the release clears the SparkContext-wide shared
    CacheManager, so it assumes the harness shape every consumer here has —
    ONE session, queries invoked SEQUENTIALLY, each result materialized
    before the next query is built (the driver window, the parity sweep,
    bench, pytest all satisfy it). A caller that interleaves two queries'
    build/materialize phases, or shares the context with another session
    that holds its own caches, loses those fragments — correctness is
    unaffected (cleared frames recompute from lineage), but the single-scan
    persist benefit silently degrades to multi-scan. Don't embed wrapped
    queries in such a harness without switching the release strategy to
    per-plan unpersist.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str, *args, **kwargs) -> DataFrame:
            global _DEPTH
            if _DEPTH == 0:
                from ..session import release_caches

                release_caches(spark)
            _DEPTH += 1
            try:
                return fn(spark, sf_dir, *args, **kwargs)
            finally:
                _DEPTH -= 1

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return wrapped

    return deco
