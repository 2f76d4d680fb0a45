#!/usr/bin/env python
"""Scale study (VERDICT r2 item 3): time the heaviest queries at M=1 vs
M=10 generated data (tools/make_scale_data.py) and report the wall-time
growth ratio. A plan whose cost is dominated by per-row work should grow
≲linearly (ratio ≲ 10 on 10× rows, usually well under on local[32] where
small runs are overhead-bound); anything super-linear names a stage to fix.

Usage: python tools/scale_bench.py [m1_dir m10_dir]
Prints one JSON line: {"queries": {name: {"m1": s, "m10": s, "ratio": r}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "graph_pagerank",
    "pipeline_corpus_build",
    "kmeans_refine",
    "dedup_keep_best",
    "pipeline_nutrition_e2e",
    # session-2 additions (documents-bound; span_dedup explodes every
    # positional 3-gram — the heaviest per-row fan-out in the engine)
    "span_dedup",
    "dedup_incremental",
    "dsir_resample",
    "collocation_pmi",
    # session-4 additions: chunk-level dedup (explode + frequency window),
    # distributed-prefix-sum sharding, and the full-pipeline audit query
    "dedup_lines",
    "shard_balanced",
    "pipeline_drop_reasons",
    # events-bound time-series group (gen_events added to make_scale_data)
    "ts_motif_match",
    "sessionize_batch",
    "rolling_7d_features",
    "anomaly_mad",
    # session-5 additions with genuinely input-scaling work
    "join_range_binned",
    "join_interval_overlap",
    "graph_kcore",
    "bm25_search",
    "similarity_maxsim",
    "er_golden_records",
    "ann_recall_eval",
    # session-6 experiments family: journey CEP (per-user collect +
    # regex), exact-integer SRM, RFM quintiles, linear attribution
    "cep_pattern_match",
    "ab_srm_check",
    "rfm_segments",
    "attribution_linear",
    # session-7 additions: prefix-sum FIFO matching and min-plus shortest
    # path (lineitem-bound), rank-AUC histogram decomposition and
    # largest-remainder allocation (documents-bound), map-side hub argmin
    # (customer-bound)
    "fifo_match_lots",
    "graph_shortest_path",
    "eval_auc_rank",
    "allocate_largest_remainder",
    "geo_hub_assign",
    # round-5 additions: the real-codec decode queries (Arrow-boundary
    # cost; documents-bound) and the new session-7/8 batch ops
    "mm_decode_bmp",
    "mm_decode_wav",
    "survival_table",
    "ks_two_sample",
    "auction_second_price",
]


def main():
    m1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_m1"
    m10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_m10"
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.session import get_spark
    from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

    spark = get_spark("scale-bench")
    out = {}
    for name in HEAVY:
        fn = plans.QUERIES[name]
        times = {}
        for label, d in (("m1", m1), ("m10", m10)):
            best = float("inf")
            for _ in range(2):  # best-of-2: first run pays JIT/readahead
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            times[label] = round(best, 3)
            times[f"{label}_rows"] = n
        times["ratio"] = round(times["m10"] / times["m1"], 2)
        out[name] = times
        print(f"  {name}: m1={times['m1']}s m10={times['m10']}s "
              f"ratio={times['ratio']} rows {times['m1_rows']}→{times['m10_rows']}",
              file=sys.stderr)
    print(json.dumps({"queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
