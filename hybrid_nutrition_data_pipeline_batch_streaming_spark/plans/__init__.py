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
# oracles. Round-7 rotation (VERDICT r6 item 1, NOTES "Round-7 rotation
# backlog"): 247/306 queries carry a green driver CORRECTNESS row after six
# rounds, so this round keeps the same FIVE core regressions and fills the
# other FORTY-FIVE slots with oracle-backed queries that have never had a
# driver row, leading with `wire_mp_roundtrip` (the round-6 multi-partition
# wire path earning a driver row), then the ops/audit group, the timeseries
# tail, and the text/corpus tail. `pipeline_user_features` is the one
# backlog query bumped to r8 (the backlog held 46 for 45 slots).
# Rotated-out queries stay registered below the window, still verified by
# the local differential harness (tests/test_oracle_parity.py) at
# sf0.001 + sf0.01.
PRIORITY: tuple[str, ...] = (
    # -- 5 core regressions (driver-green in r1-r6) --
    "flagship_revenue",
    "join_inner",
    "dedup_last_write",
    "pipeline_nutrition_e2e",
    "stream_tumbling_live",
    # -- multi-partition wire broker path (r6 upgrade, zero driver rows) --
    "wire_mp_roundtrip",
    # -- ops / audit / allocation (E-class tail) --
    "agg_approx_topk",
    "arrow_batch_digest",
    "checksum_buckets",
    "corr_matrix",
    "file_provenance",
    "histogram_equidepth",
    "join_size_audit",
    "length_bucketize",
    "skew_report",
    "table_checksum",
    "udtf_dynamic_schema",
    "url_domain_caps",
    "url_parse_funcs",
    "sketch_hll_merge",
    "bitmap_segment_overlap",
    "shard_balanced",
    "greedy_set_cover",
    "allocate_largest_remainder",
    "fifo_match_lots",
    "phrase_search",
    "text_search_rank",
    # -- timeseries tail --
    "anomaly_seasonal",
    "trend_ols",
    "interval_union_length",
    "concurrency_peak",
    "forecast_eval_naive",
    "rolling_ols_slope",
    "metric_decomposition",
    "window_sliding_agg",
    "join_temporal_scd2",
    "temporal_split_purged",
    "winsorize_values",
    "standardize_values",
    "running_sum_reset",
    "gini_by_segment",
    # -- text / corpus tail --
    "clean_repeated_tokens",
    "corpus_temperature_sample",
    "corpus_recipe_plan",
    "corpus_drift_tv",
    "mojibake_score",
    "epoch_shuffle",
    "split_leakage_check",
    "lang_confusion_matrix",
    "pipeline_drop_reasons",
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
