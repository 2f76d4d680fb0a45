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
# oracles. Round-6 rotation (VERDICT r5 item 1): 202/305 queries carry a
# green driver CORRECTNESS row after five rounds, so this round keeps the
# same FIVE core regressions and fills the other FORTY-FIVE slots with
# oracle-backed queries that have never had a driver row, leading with the
# round-5 live-socket wire queries (the S1/S2 stand-in path earning driver
# rows), then the set-ops / relational tail, text/corpus, dedup/similarity
# variants, streaming, samples/privacy, and sessions/attribution groups.
# Rotated-out queries stay registered below the window, still verified by
# the local differential harness (tests/test_oracle_parity.py) at
# sf0.001 + sf0.01.
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green in r1-r5) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- live TCP wire broker path (r5 S1/S2 stand-in, zero driver rows) --
    "wire_topic_roundtrip",
    "wire_stream_windows",
    # -- set ops / relational tail (§2.7, P6, O2) --
    "set_except_all",
    "set_intersect_all",
    "filter_not_in",
    "join_lateral_topn",
    "agg_having_join_back",
    "join_range_binned",
    "join_interval_overlap",
    "basket_pairs",
    "abc_classification",
    "keyset_pagination",
    "agg_mode",
    "topk_diversified",
    "share_of_parent",
    # -- text / corpus (X3, E16/E17) --
    "explode_outer_tokens",
    "token_count",
    "pipeline_text_curation",
    "text_chunking",
    "curriculum_order",
    "vocab_coverage",
    # -- dedup / similarity variants (X1/X2) --
    "dedup_minhash",
    "dedup_cluster_report",
    "dedup_snapshots",
    "url_canonical_dedup",
    "embedding_quantize",
    "hard_negative_mining",
    "similarity_mmr",
    "centroid_similarity",
    # -- streaming (T4/T6 batch-equivalents + live drains) --
    "stream_tumbling",
    "stream_stream_join",
    "stream_user_growth_live",
    "stream_hll_live",
    # -- samples / privacy (E21/E22) --
    "sample_stratified",
    "sample_reservoir",
    "sample_weighted",
    "kanon_audit",
    "kanon_generalize",
    "ldiv_audit",
    # -- sessions / attribution (E48-class) --
    "conversion_latency",
    "attribution_last_touch",
    "attribution_linear",
    "funnel_windowed",
    "retention_curve",
    "cohort_ltv",
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
