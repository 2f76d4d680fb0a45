"""Write-once staged edge distillations shared across the graph family.

VERDICT r10 item 6: ``path_counts_census`` (80.4 s at M=100),
``graph_pagerank``, ``graph_kcore`` and ``recursive_path_counts`` each paid
the same orders⋈lineitem → DISTINCT (custkey, suppkey) distillation per
query (~60 M edges at M=100), and ``graph_bfs_khop`` / ``graph_jaccard_sim``
each paid the lineitem → DISTINCT (partkey, suppkey) twin. The distillation
is a pure function of the FIXTURE, not of the query — so it is staged to
parquet once per (fixture, kind) and every consumer reads the staged table.

Design points:

- **Content-addressed**: the staging directory name embeds a fingerprint of
  the source parquet files (path + size + mtime_ns per file). The driver
  regenerates fixtures between rounds; a regenerated fixture gets a new
  fingerprint and the stale entry is simply never read again (and is pruned
  by count, below). No explicit invalidation step can be forgotten.
- **Atomic publish**: built into a ``.tmp-<pid>`` directory, then
  ``os.rename``d into place — a concurrent builder loses the race cleanly
  and reads the winner. Readers only ever see complete directories.
- **Lineage**: the staged read is a leaf parquet scan, so consumers need no
  further checkpoint on the distillation — the scan IS the lineage cut, and
  (unlike localCheckpoint blocks) it lives outside the executor storage
  pool, which is exactly the heap relief the kcore M=100 study wanted from
  reliable checkpoints (session.py docstring).
- **Cluster shape**: on a real deployment this directory is the lakehouse's
  staging zone (object storage); write-once-read-many distillations are the
  standard materialized-view move, and the fingerprint scheme carries over
  unchanged (object stores expose size + mtime).

The staging root is ``$SPARK_GRAFT_STAGING_DIR`` when set, else
``<repo>/spark-warehouse/staged_edges`` when the package lives in a
writable checkout, else a tmpdir. At most ``_KEEP_NEWEST`` entries are
retained (best-effort prune of the oldest — regenerated fixtures orphan
their predecessors' entries).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEEP_NEWEST = 8

#: kind -> (source tables, builder version). The version participates in
#: the fingerprint: when a builder's SEMANTICS change (minhash params, a
#: different distinct), bumping it orphans every entry built by the old
#: code — without it a staged table could silently serve stale semantics
#: to a round that changed the plan. Columns are the RAW key pairs —
#: consumers apply their own node encodings ('c'||k strings,
#: parity-encoded 2k/2k+1 longs) map-side, so one staged table serves
#: every encoding.
_KINDS = {
    "cust_supp": (("orders", "lineitem"), "v1"),
    "part_supp": (("lineitem",), "v1"),
    # The verified banded-MinHash near-dup pair table (doc_a, doc_b,
    # jaccard >= 0.5) — the edge base of the whole document-cluster family
    # (connected components, triangles, degrees, modularity, keep-best,
    # threshold sweep), each of which rebuilt shingles+signatures+joins
    # per query before r11.
    "doc_pairs": (("documents",), "v1"),
}


def _build(kind: str, cat) -> DataFrame:
    if kind == "doc_pairs":
        from ..plans.dedup import banded_minhash_pairs

        return banded_minhash_pairs(cat.documents.select("doc_id", "text"))
    if kind == "cust_supp":
        return (
            cat.orders.select("o_orderkey", "o_custkey")
            .join(
                cat.lineitem.select("l_orderkey", "l_suppkey"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select(
                F.col("o_custkey").alias("custkey"),
                F.col("l_suppkey").alias("suppkey"),
            )
            .distinct()
        )
    if kind == "part_supp":
        return (
            cat.lineitem.select(
                F.col("l_partkey").alias("partkey"),
                F.col("l_suppkey").alias("suppkey"),
            ).distinct()
        )
    raise ValueError(f"unknown staged distillation kind: {kind}")


def _staging_root() -> str:
    env = os.environ.get("SPARK_GRAFT_STAGING_DIR")
    if env:
        return env
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.access(repo, os.W_OK):
        return os.path.join(repo, "spark-warehouse", "staged_edges")
    return os.path.join(tempfile.gettempdir(), "hybrid_nutrition_staged_edges")


def _file_stats(path: str):
    """(relpath, size, mtime_ns) for a parquet file or directory tree."""
    if os.path.isfile(path):
        st = os.stat(path)
        yield (os.path.basename(path), st.st_size, st.st_mtime_ns)
        return
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(root, f)
            st = os.stat(p)
            yield (os.path.relpath(p, path), st.st_size, st.st_mtime_ns)


def fingerprint(sf_dir: str, kind: str) -> str:
    tables, version = _KINDS[kind]
    h = hashlib.sha256()
    h.update(os.path.realpath(sf_dir).encode())
    h.update(f"{kind}:{version}".encode())
    for table in tables:
        src = os.path.join(sf_dir, f"{table}.parquet")
        for rel, size, mtime in _file_stats(src):
            h.update(f"{table}/{rel}:{size}:{mtime}".encode())
    return h.hexdigest()[:16]


def _prune(root: str) -> None:
    try:
        import time

        entries = []
        for d in os.listdir(root):
            path = os.path.join(root, d)
            if ".tmp-" in d:
                # A build directory whose writer crashed (or lost the
                # publish race before its cleanup ran). Live builds are
                # written and renamed within one call, so anything older
                # than a day is garbage — without this, crashed builders
                # leak disk forever.
                try:
                    if time.time() - os.path.getmtime(path) > 86_400:
                        shutil.rmtree(path, ignore_errors=True)
                except OSError:
                    pass
                continue
            if not d.startswith("."):
                entries.append(path)
        entries.sort(key=os.path.getmtime, reverse=True)
        for stale in entries[_KEEP_NEWEST:]:
            shutil.rmtree(stale, ignore_errors=True)
    except OSError:
        pass


def staged_edges(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    """The distilled edge table for ``kind``, built at most once per fixture.

    Returns a plain parquet-backed DataFrame; the first caller per
    (fixture content, kind) pays the distillation + write, every later
    caller — in this process or any other — pays a leaf scan.
    """
    from ..catalog import Catalog

    root = _staging_root()
    path = os.path.join(root, f"{kind}-{fingerprint(sf_dir, kind)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        _build(kind, Catalog(spark, sf_dir)).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # A concurrent builder published first — read the winner.
            shutil.rmtree(tmp, ignore_errors=True)
        _prune(root)
    return spark.read.parquet(path)
