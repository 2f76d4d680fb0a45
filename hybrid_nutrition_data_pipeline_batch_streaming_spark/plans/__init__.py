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
# Round-10 instantiation — TEN rule-2 seats (every plan/oracle changed
# this round; details in NOTES.md round 10 — dedup_simhash_multiprobe's
# rule-2 obligation is satisfied by its pre-existing r2-age seat below):
#   scd2_history         merge fused to ONE full-outer-join pass (operators/
#                        scd.py) — customer/orders each scanned once
#   join_temporal_scd2   inherits the fused merge (customer×3 → ×1)
#   dq_checks            orphan LEFT join now fan-out-proof (DISTINCT
#                        o_orderkey side — ADVICE r9)
#   dedup_ngram_jaccard  packed-long guard enforces BOTH id-space bounds
#                        (negative doc_id would corrupt silently — ADVICE r9)
#   retention_curve      NULL-user events excluded on both engines (ADVICE r9)
#   cohort_ltv           same NULL-user alignment (ADVICE r9)
#   mm_decode_ppm        NEW — PPM decoder hash-pinned end-to-end through
#                        the decode_image sniffer (VERDICT r9 item 5)
#   graph_jaccard_sim    packed-long guard now enforces BOTH id-space
#                        bounds (same ADVICE-r9 hazard class as the dedup
#                        twin site; takes the window's last rule-3 seat,
#                        pushing repetition_score to the r11 backlog)
#   dedup_simhash_multiprobe  fused probe-join rework (already seated as
#                        an r2-age rule-3 key — the seat now satisfies
#                        rule 2): the candidate-materializing
#                        union+distinct+re-join was found DEAD at M=100
#                        by the r10 risk sweep; verification and
#                        first-probe-wins dedup now run as residual
#                        predicates inside each probe's equi-join
#   retention_cohorts    fused to ONE events scan (per-user MIN window
#                        over distinct user-months — the retention_curve
#                        recipe; the last untriaged rescan site; M=100
#                        19.9 → 12.4 s); takes mm_decode_stats' seat
#   path_counts_census   NEW — the scale form of recursive_path_counts
#                        (whose UNION ALL recursion materializes 540 M
#                        path rows at M=100 and trips Spark's recursion
#                        guard); same oracle, per-level weighted-count
#                        aggregation; takes the next rule-3 seat,
#                        pushing pii_redact to the r11 backlog
# The age ladder after r9: 16 queries whose newest green row is r2 (the
# corrected count — the r9 NOTES backlog omitted math_funcs and
# array_funcs) and 41 r3-age. The remaining slots re-verify ALL 16 r2-age
# rows and the first 19 r3-age rows in registry order (scd2_history and
# retention_cohorts, r3-age keys, are seated under rule 2 instead),
# dropping the maximum green-row age from r2 to r3 (repetition_score,
# pii_redact, mm_decode_stats head the r11 rule-3 backlog).
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green r1-r9) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- rule 2: plan/oracle changed in r10 --
    "scd2_history",
    "join_temporal_scd2",
    "dq_checks",
    "dedup_ngram_jaccard",
    "retention_curve",
    "cohort_ltv",
    "mm_decode_ppm",
    "graph_jaccard_sim",
    "path_counts_census",
    "retention_cohorts",
    # -- rule 3: all 16 r2-age rows (registry order) --
    "math_funcs",
    "array_funcs",
    "window_running_sum",
    "window_ntile",
    "wordcloud_tokens",
    "text_stats",
    "dedup_exact_text",
    "dedup_simhash_multiprobe",
    "dedup_ngram_prefix",
    "similarity_topk",
    "dedup_embedding",
    "stream_stateful_totals",
    "json_map",
    "enrich_rest_stub",
    "grouped_udaf_median",
    "dedup_connected_components",
    # -- rule 3 cont.: first 19 of the r3-age cohort (registry order;
    # scd2_history and retention_cohorts moved up into the rule-2 block;
    # repetition_score, pii_redact and mm_decode_stats displaced to r11
    # by the late rule-2 seats) --
    "agg_macros",
    "recursive_path_counts",
    "agg_grouping_sets",
    "null_semantics",
    "json_flatten",
    "sessionize_batch",
    "doc_fingerprint",
    "embed_feature_hash",
    "dedup_minhash_banded",
    "similarity_ann_ivf",
    "similarity_topk_int8",
    "dedup_semantic",
    "cluster_centroids",
    "kmeans_refine",
    "pipeline_embed_topk",
    "similarity_topk_pq",
    "stream_session_windows",
    "stream_static_enrich",
    "mm_frame_sample",
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
