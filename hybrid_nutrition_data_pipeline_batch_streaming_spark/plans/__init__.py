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
# oracles. Round-8 endgame rotation (VERDICT r7 item 1, NOTES "Round-8
# endgame window"): 292/306 queries carry a green driver CORRECTNESS row
# after seven rounds with zero failures. This window (a) keeps the same
# FIVE core regressions, (b) drives the final SEVEN oracle-backed
# never-verified queries through the gate, (c) adds the TWO new r8
# error-bound companions for the approx aggregates, and (d) spends the
# remaining slots re-verifying every query whose PLAN CHANGED in round 7
# after its last driver row — the search-family map-side tf rework
# (plans/search.py _doc_tf), the (source, pack_shard) packing split, and
# both cache-boundary sweep batches — plus graph_kcore (r8
# scratch_checkpoint gating) and stream_stream_join (r7 watermark
# re-sizing), finishing with the oldest-green (r2-only) rows. After this
# window no green row predates its query's current plan.
# Rotated-out queries stay registered below the window, still verified by
# the local differential harness (tests/test_oracle_parity.py) at
# sf0.001 + sf0.01.
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green in r1-r7) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- final 7 never-driver-verified oracle-backed queries --
    "pipeline_user_features",
    "embedding_matryoshka_eval",
    "embedding_outliers",
    "graph_degrees",
    "path_trigrams",
    "sessionize_gap_sweep",
    "stickiness_dau_mau",
    # -- new r8 queries: approx-agg error-bound companions --
    "agg_approx_distinct_bound",
    "agg_approx_percentile_bound",
    # -- r7 search-family rework (map-side _doc_tf) --
    "bm25_search",
    "search_prf_expand",
    "tfidf_terms",
    # -- r7 packing split + corpus pipeline --
    "pack_sequences",
    "pipeline_corpus_build",
    # -- r7 cache-boundary sweep, batch 1 --
    "similarity_maxsim",
    "similarity_ann_lsh",
    "join_delta_maintain",
    "funnel_conversion",
    "funnel_windowed",
    "kmv_overlap",
    "growth_accounting",
    "er_golden_records",
    "period_over_period",
    "table_diff_audit",
    "ts_autocorr",
    # -- r7 cache-boundary sweep, threshold-2 batch --
    "ts_decompose",
    "gap_fill_forward",
    "vocab_coverage",
    "running_distinct",
    "kth_order_statistics",
    "weighted_median",
    "attribution_linear",
    "conversion_latency",
    "agg_decayed",
    # -- plans changed r7/r8: kcore checkpoint, join watermark --
    "graph_kcore",
    "stream_stream_join",
    # -- r8 promotions/companions earning their first hash-checked row:
    # text_ml_pipeline (rows-only → full oracle via the pinned stop list),
    # the MLlib-LSH recall contract, the seeded-sampler bound --
    "text_ml_pipeline",
    "similarity_ann_mllib_recall",
    "sample_bernoulli_bound",
    # -- oldest-green re-verification (r2-only rows) --
    "wire_topic_roundtrip",
    "wire_stream_windows",
    "join_broadcast",
    "join_outer",
    "agg_conditional",
    "window_lag",
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
