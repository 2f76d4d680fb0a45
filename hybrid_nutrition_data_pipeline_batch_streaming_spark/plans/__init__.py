"""Named query plans — the engine's public query surface.

Importing this package populates the registry from every query module; the
driver contract (``__spark_entry__.py``) re-exports ``QUERIES`` / ``ORACLE``.

Ordering matters: the driver's correctness harness checks the FIRST 50
registered queries against their DuckDB oracles. ``PRIORITY`` pins those 50
slots to one oracle-backed representative per SURVEY.md §2 row plus every
north-star operator (dedup / similarity / text / streaming / e2e pipeline /
multimodal). Everything else — standalone variants absorbed into a composite
(e.g. ``regexp_funcs`` ⊂ ``str_funcs``), rows-only sketch/sampling queries,
and extras beyond §2 — registers after the window and is still verified by
the local differential harness (tests/test_oracle_parity.py).
"""

from .registry import ORACLE, QUERIES, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import semistructured  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import nutrition  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import multimodal_queries  # noqa: F401,E402
from . import udf_surface  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import graph  # noqa: F401,E402
from . import corpus  # noqa: F401,E402
from . import cdc  # noqa: F401,E402
from . import skew_queries  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import profiling  # noqa: F401,E402
from . import pysource  # noqa: F401,E402
from . import textmatch  # noqa: F401,E402
from . import search  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import webcuration  # noqa: F401,E402
from . import opsaudit  # noqa: F401,E402
from . import engagement  # noqa: F401,E402
from . import experiments  # noqa: F401,E402
from . import evaluation  # noqa: F401,E402
from . import geo  # noqa: F401,E402

# The driver-checked window: exactly these 50, in this order, all with
# oracles.
#
# STANDING ROTATION POLICY (VERDICT r8 item 1 — coverage is complete at
# 304/304 oracle-backed ever-green, so from round 9 on the window is a
# freshness rotation, not a coverage push). Slots are assigned in order:
#   1. the FIVE core regressions (flagship_revenue, join_inner,
#      dedup_last_write, pipeline_nutrition_e2e, stream_tumbling_live) —
#      always present, every round;
#   2. any query whose PLAN or ORACLE changed this round after its last
#      green driver row — a green row must never predate the code it
#      vouches for;
#   3. the remaining slots go to the OLDEST green rows registry-wide
#      (compute with: latest green round per query over CORRECTNESS_r*.json,
#      ascending), so the maximum green-row age strictly decreases every
#      round until the whole registry cycles.
# Rotated-out queries stay registered below the window, still verified by
# the local differential harness (tests/test_oracle_parity.py) at
# sf0.001 + sf0.01.
#
# Round-9 instantiation — SIX rule-2 seats (every plan/oracle changed
# this round; details in NOTES.md round 9 / SCALE.md round-9 studies):
#   text_ml_pipeline     oracle stop-list SQL now derived (byte-identical)
#   dedup_ngram_jaccard  packed-long posting-bag rework
#   join_range_binned    bin-equi-join → coverage census (195.9 → 11.3 s)
#   dq_checks            3 fact scans → 1 (17.1 → 4.7 s)
#   retention_curve      3 fact scans → 1 (sortless per-user window)
#   cohort_ltv           3 fact scans → 1 (two-grain fused aggregate)
# The age ladder after r8 is 22 queries whose only green row is r1 and 34
# whose newest is r2 — the remaining slots re-verify ALL 22 r1-age rows
# and the first 17 r2-age rows (registry order), dropping the maximum
# green-row age from r1 to r2 (math_funcs, array_funcs,
# window_running_sum, window_ntile head the r10 rule-3 backlog).
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green r1-r8) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- rule 2: plan/oracle changed in r9 --
    "text_ml_pipeline",
    "dedup_ngram_jaccard",
    "join_range_binned",
    "dq_checks",
    "retention_curve",
    "cohort_ltv",
    # -- rule 3: the 22 queries whose only green row is r1 --
    "filter_range",
    "filter_inlist",
    "join_semi",
    "join_star_5way",
    "agg_rollup",
    "set_union",
    "set_intersect",
    "set_except",
    "agg_cube",
    "filter_scalar_subquery",
    "set_union_all",
    "agg_percentile",
    "topk_per_group",
    "agg_boolean",
    "agg_pivot",
    "unpivot_metrics",
    "try_funcs",
    "regexp_funcs",
    "date_arith_funcs",
    "agg_minmax_by",
    "window_first_last",
    "window_range_frame",
    # -- rule 3 cont.: first 17 of the r2-age cohort (registry order;
    # dq_checks moved up into the rule-2 block) --
    "sql_endpoint",
    "scan_project",
    "incremental_antijoin",
    "join_range",
    "join_asof",
    "topk_sodium",
    "agg_distinct",
    "sort_multikey",
    "filter_predicates",
    "agg_rollup_cube",
    "set_ops",
    "agg_collect_sorted",
    "filter_nonempty",
    "filter_corrupt",
    "cast_defaults",
    "str_funcs",
    "date_funcs",
)


def _reorder() -> None:
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    no_oracle = [n for n in PRIORITY if n not in ORACLE]
    ordered = {n: QUERIES[n] for n in PRIORITY}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    oracle_ordered = {n: ORACLE[n] for n in PRIORITY if n in ORACLE}
    oracle_ordered.update((n, s) for n, s in ORACLE.items() if n not in oracle_ordered)
    ORACLE.clear()
    ORACLE.update(oracle_ordered)
    if no_oracle:
        raise RuntimeError(f"PRIORITY queries missing oracles: {no_oracle}")


_reorder()
