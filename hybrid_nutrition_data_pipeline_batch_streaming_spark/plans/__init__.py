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
# Round-11 instantiation — TEN rule-2 seats:
#   dedup_simhash_multiprobe_wide  NEW (VERDICT r10 item 3a) — the 16-bit
#                        block production contract of the multiprobe; the
#                        oracle is the brute-force Hamming join restricted
#                        to the wider-block recall contract
#   dedup_ngram_jaccard_dfcut      NEW (VERDICT r10 item 3b) — the
#                        df-cutoff production contract of the jaccard
#                        dedup, cutoff mirrored in the oracle's HAVING
#   recursive_path_counts          seed filter no longer truncates ids
#                        past 10 digits (unbounded substr — ADVICE r10);
#                        edges CTE reads the staged distillation
#   path_counts_census             same fix + staged edges
#   graph_kcore                    initial distillation → staged edge
#                        table (operators/staging.py, VERDICT r10 item 6)
#   graph_jaccard_sim              adjacency → the staged part_supp table
#   dedup_connected_components     edge base → staged doc_pairs (the
#                        banded-minhash pair table, built once per fixture)
#   graph_degrees                  same staged doc_pairs conversion
#   graph_modularity               same
#   dedup_threshold_sweep          same
# (graph_pagerank, graph_bfs_khop, graph_triangles and dedup_keep_best
# also moved to staged edges; their rule-2 obligation is satisfied by
# their pre-existing rule-3 seats below.)
# The age ladder after r10 (recomputed over CORRECTNESS_r01-r10): 20
# queries whose newest green row is r3, then 35 r4-age. The remaining
# slots re-verify ALL 20 r3-age rows (including repetition_score,
# pii_redact, mm_decode_stats — displaced from the r10 window by its late
# rule-2 seats) and the first 15 r4-age rows in registry order, dropping
# the maximum green-row age from r3 to r4 (the remaining 20 r4-age keys —
# sketch_bloom, sketch_hll, ooo_audit, fk_audit, recon_order_totals,
# user_streaks, cusum_changepoint onward — head the r12 rule-3 backlog).
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green r1-r10) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- rule 2: plan/oracle changed in r11 --
    "dedup_simhash_multiprobe_wide",
    "dedup_ngram_jaccard_dfcut",
    "recursive_path_counts",
    "path_counts_census",
    "graph_kcore",
    "graph_jaccard_sim",
    "dedup_connected_components",
    "graph_degrees",
    "graph_modularity",
    "dedup_threshold_sweep",
    # -- rule 3: all 20 r3-age rows (registry order) --
    "mm_decode_stats",
    "pii_redact",
    "repetition_score",
    "contamination_check",
    "corpus_split",
    "corpus_mix_sample",
    "quality_classifier",
    "dedup_keep_best",
    "graph_pagerank",
    "join_salted",
    "agg_two_phase",
    "rolling_7d_features",
    "anomaly_mad",
    "profile_columns",
    "histogram_value",
    "ngram_bigram_lm",
    "agg_incremental_merge",
    "pysource_items",
    "fuzzy_match_names",
    "higher_order_funcs",
    # -- rule 3 cont.: first 15 of the r4-age cohort (registry order) --
    "sql_pipe_syntax",
    "sql_session_variables",
    "variant_extract",
    "lang_id",
    "quality_score",
    "collocation_pmi",
    "bpe_top_pairs",
    "dedup_simhash",
    "ann_recall_eval",
    "udtf_expand_items",
    "graph_triangles",
    "graph_bfs_khop",
    "graph_shortest_path",
    "agg_kmv_distinct",
    "sketch_countmin",
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
