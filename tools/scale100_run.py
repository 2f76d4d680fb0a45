#!/usr/bin/env python
"""M=100 scale runs, one query per fresh process (VERDICT r4 item 2).

The first M=100 sweep of the session-6/7 heavies ran six queries in ONE
session and the later readings absorbed the earlier queries' GC/disk
pressure (same pathology as the bench-noise findings in NOTES.md). This
runner isolates each query in its own interpreter with the documented
M=100 recipe: 8 g heap, 64 shuffle partitions, reliable checkpoint dir
(wiped per query).

Usage: python tools/scale100_run.py [data_dir] [query ...]
Prints one line per query: <name>: <sec>s rows=<n>
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

DEFAULT_QUERIES = [
    "graph_bfs_khop",
    "join_delta_maintain",
    "graph_jaccard_sim",
    "graph_modularity",
    "dedup_threshold_sweep",
    "er_golden_records",
]

_CHILD = r"""
import time, sys
sys.path.insert(0, {repo!r})
from hybrid_nutrition_data_pipeline_batch_streaming_spark.session import get_spark
from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

spark = get_spark("scale-m100", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
t0 = time.perf_counter()
n = plans.QUERIES[{name!r}](spark, {data!r}).count()
print(f"{name}: {{time.perf_counter()-t0:.1f}}s rows={{n}}", flush=True)
"""


def main() -> None:
    args = sys.argv[1:]
    data = args[0] if args else "/tmp/scale_m100"
    queries = args[1:] or DEFAULT_QUERIES
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = "/tmp/ckpt_m100"
    env = dict(os.environ, SPARK_GRAFT_CHECKPOINT_DIR=ckpt)
    for name in queries:
        shutil.rmtree(ckpt, ignore_errors=True)
        os.makedirs(ckpt, exist_ok=True)
        code = _CHILD.format(repo=repo, name=name, data=data)
        res = subprocess.run(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        out = res.stdout.strip()
        if out:
            print(out, flush=True)
        else:
            # ADVICE r5: surface the failure the runner exists to isolate —
            # print the stderr tail (OOMs / Py4J tracebacks) on a blank run.
            print(f"{name}: FAILED rc={res.returncode}", flush=True)
            tail = res.stderr.strip().splitlines()[-25:]
            for line in tail:
                print(f"  ! {line}", flush=True)


if __name__ == "__main__":
    main()
