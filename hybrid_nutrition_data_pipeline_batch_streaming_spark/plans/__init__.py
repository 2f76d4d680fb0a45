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

# The driver-checked window: exactly these 50, in this order, all with
# oracles. One per §2 row + all north-star operators.
PRIORITY: tuple[str, ...] = (
    # §2.1-§2.3 relational core
    "flagship_revenue",
    "sql_endpoint",
    "scan_project",
    "filter_predicates",
    "join_inner",
    "join_broadcast",
    "join_outer",
    "enrich_rest_stub",  # S7/U2 mapInPandas boundary (J4 semi stays local-checked)
    "incremental_antijoin",
    "join_range",
    "join_asof",
    # §2.4 aggregation
    "agg_macros",
    "topk_sodium",
    "agg_distinct",
    "agg_rollup_cube",
    "agg_conditional",
    "agg_collect_sorted",
    # §2.6-§2.7 sort / set ops, DQ suite
    "sort_multikey",
    "set_ops",
    "dq_checks",
    # §2.5 windows + LWW upsert semantics
    "dedup_last_write",
    "window_lag",
    "window_running_sum",
    "window_ntile",
    # §2.2 / §2.8 semi-structured + function families
    "filter_nonempty",
    "filter_corrupt",
    "json_flatten",
    "cast_defaults",
    "str_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "json_map",
    # §2.10 UDF surface
    "grouped_udaf_median",
    # §2.11 X3 text analysis
    "wordcloud_tokens",
    "text_stats",
    "dedup_connected_components",
    "similarity_ann_ivf",
    # §2.11 X2 dedup family
    "dedup_exact_text",
    "pipeline_corpus_build",
    "dedup_minhash_banded",
    "dedup_simhash_multiprobe",
    "dedup_ngram_prefix",
    "dedup_embedding",
    # §2.11 X1 similarity
    "similarity_topk",
    "similarity_ann_lsh",
    # e2e + §2.9 streaming + §2.11 X4 multimodal
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    "stream_stateful_totals",
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
