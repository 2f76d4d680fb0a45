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
# oracles. Round-4 rotation (VERDICT r3 item 1): 112/301 queries carry a
# green driver CORRECTNESS row after three rounds, so this round keeps FIVE
# core regressions and fills the other FORTY-FIVE slots with oracle-backed
# queries that have never had a driver row, prioritizing whole families with
# zero driver coverage: engagement, evaluation, search, sketches,
# experiments, geo, opsaudit, and the Spark-4 SQL surface. Rotated-out
# queries stay registered below the window, still verified by the local
# differential harness (tests/test_oracle_parity.py) at sf0.001 + sf0.01.
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green in r1+r2+r3) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- engagement (E21/E45, zero driver rows) --
    "running_distinct",
    "user_streaks",
    "agg_decayed",
    "cusum_changepoint",
    "activity_bitmap",
    "ctr_wilson",
    # -- classifier / ranking evaluation (E49) --
    "eval_auc_rank",
    "eval_pr_thresholds",
    "eval_calibration_bins",
    "eval_label_kappa",
    "eval_gains_lift",
    # -- search / late interaction (E22, E27, X1 eval) --
    "bm25_search",
    "similarity_maxsim",
    "ann_recall_eval",
    "search_prf_expand",
    # -- sketches (A5 extensions, E40-E44) --
    "sketch_hll",
    "agg_kmv_distinct",
    "sketch_countmin",
    "sketch_bloom",
    "kmv_overlap",
    # -- experiments / sequence analytics --
    "ab_cuped",
    "ab_srm_check",
    "cep_pattern_match",
    "rfm_segments",
    # -- geo (E50) --
    "geo_hub_assign",
    "geo_grid_hotspots",
    # -- ops audit (E46-class) --
    "fk_audit",
    "table_diff_audit",
    "ooo_audit",
    "recon_order_totals",
    # -- Spark-4 SQL surface (E58, F4, U3) --
    "sql_pipe_syntax",
    "variant_extract",
    "udtf_expand_items",
    "sql_session_variables",
    # -- graph suite beyond pagerank (E26, E52) --
    "graph_triangles",
    "graph_kcore",
    "graph_bfs_khop",
    "graph_shortest_path",
    # -- text analysis (X3: lang-id, quality, BPE, PMI) --
    "lang_id",
    "quality_score",
    "bpe_top_pairs",
    "collocation_pmi",
    # -- dedup variants with no driver row (X2) --
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # -- exact order statistics (E36) --
    "weighted_median",
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
