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
# oracles. Round-3 rotation (VERDICT r2 item 1): rounds 1-2 drove the
# one-per-§2-row window to 50/50 green twice, so this round keeps TEN core
# regressions (flagship + one representative per family: join, agg, window/
# LWW, semi-structured, dedup, similarity, e2e, streaming, multimodal) and
# fills the other FORTY slots with oracle-backed queries that have never had
# a driver CORRECTNESS row — the graph/SCD/skew/timeseries/profiling/
# curation/vector suites. Rotated-out queries stay registered below the
# window, still verified by the local differential harness
# (tests/test_oracle_parity.py) at sf0.001 + sf0.01.
PRIORITY: tuple[str, ...] = (
    # -- 10 core regressions (driver-green in r1+r2) --
    "flagship_revenue",
    "join_inner",
    "agg_macros",
    "dedup_last_write",
    "json_flatten",
    "dedup_minhash_banded",
    "similarity_ann_ivf",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    "mm_frame_sample",
    # -- SQL surface depth (E8/E9, never driver-checked) --
    "recursive_path_counts",
    "agg_grouping_sets",
    "null_semantics",
    "higher_order_funcs",
    # -- iterative / graph / clustering (E6, X1 trainer) --
    "graph_pagerank",
    "cluster_centroids",
    "kmeans_refine",
    # -- CDC / skew / custom source (E10, skew ops, E12) --
    "scd2_history",
    "join_salted",
    "agg_two_phase",
    "pysource_items",
    # -- product analytics + time series (E1/E2) --
    "sessionize_batch",
    "funnel_conversion",
    "retention_cohorts",
    "rolling_7d_features",
    "anomaly_mad",
    "gap_fill_forward",
    # -- profiling + LM statistics (E3/E4/E5) --
    "profile_columns",
    "histogram_value",
    "ngram_bigram_lm",
    "agg_incremental_merge",
    # -- corpus curation (E7 + curation suite) --
    "pii_redact",
    "repetition_score",
    "tfidf_terms",
    "contamination_check",
    "corpus_split",
    "pack_sequences",
    "corpus_mix_sample",
    "quality_classifier",
    "dedup_keep_best",
    # -- text / embedding producers (X3 extensions, E15) --
    "doc_fingerprint",
    "embed_feature_hash",
    "fuzzy_match_names",
    # -- similarity tiers (X1: int8 + PQ + semantic + e2e) --
    "similarity_topk_int8",
    "similarity_topk_pq",
    "dedup_semantic",
    "pipeline_embed_topk",
    # -- streaming + multimodal value checks (T6/T7, X4) --
    "stream_session_windows",
    "stream_static_enrich",
    "mm_decode_stats",
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
