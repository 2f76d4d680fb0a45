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
# oracles. Round-5 rotation (VERDICT r4 item 1): 157/303 queries carry a
# green driver CORRECTNESS row after four rounds, so this round keeps the
# same FIVE core regressions and fills the other FORTY-FIVE slots with
# oracle-backed queries that have never had a driver row, prioritizing the
# families the verdict named: the real-codec multimodal decode queries,
# timeseries/finance, curation extras, the relational2 tail, the session-7/8
# ops, analytics, the M=100-scale-study heavy queries, and live streaming.
# Rotated-out queries stay registered below the window, still verified by
# the local differential harness (tests/test_oracle_parity.py) at
# sf0.001 + sf0.01.
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green in r1-r4) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- multimodal incl. the round-4 real codecs (X4, zero driver rows) --
    "mm_decode_bmp",
    "mm_decode_wav",
    "mm_metadata",
    "mm_resize",
    "mm_scene_segments",
    "mm_frame_dedup",
    "mm_caption_align",
    "mm_audio_energy",
    # -- timeseries / finance (E30-class) --
    "twap_irregular",
    "drawdown_max",
    "period_over_period",
    "ts_autocorr",
    "ts_decompose",
    "ts_motif_match",
    "ts_resample_ohlc",
    # -- curation extras (X3 quality gates, corpus ops) --
    "perplexity_filter",
    "corpus_quota_split",
    "dsir_resample",
    "dedup_lines",
    "span_dedup",
    "dedup_incremental",
    # -- relational2 tail (P6/O2/E36) --
    "top_supplier_revenue",
    "kth_order_statistics",
    "percentile_interpolated",
    "filter_exists_correlated",
    "topk_with_ties",
    # -- session-7/8 ops --
    "survival_table",
    "ks_two_sample",
    "auction_second_price",
    "stream_percentile_live",
    # -- analytics --
    "er_golden_records",
    "pareto_frontier",
    "markov_transitions",
    "growth_accounting",
    # -- M=100 scale-study heavies (VERDICT item 2 pairs driver rows) --
    "graph_jaccard_sim",
    "graph_modularity",
    "join_delta_maintain",
    "dedup_threshold_sweep",
    # -- live streaming drains beyond tumbling (T6/T7) --
    "stream_sliding_live",
    "stream_topk_live",
    "stream_cusum_live",
    # -- window / join / semistructured tail --
    "grouped_median_exact",
    "join_asof_nearest",
    "window_cume_dist",
    "xml_roundtrip_flatten",
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
