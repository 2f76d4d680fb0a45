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
  the source parquet files (path + size + mtime_ns + a 64-byte tail token
  per file — the tail is the parquet footer, so mtime-preserving copies of
  DIFFERENT data still re-fingerprint). The driver
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

Staging is OPT-IN (r12 optimization round): the staged path runs ONLY when
``$SPARK_GRAFT_STAGING_DIR`` names the deployment's staging zone. With no
staging zone configured — the default, and the driver/bench contract — the
distillation is built INLINE inside the calling query's own plan, straight
from the base parquet tables, and nothing is persisted anywhere: every
bench or oracle invocation computes from the fixture inputs. (The r11
default of a repo-local ``spark-warehouse/staged_edges`` zone meant the
first benchmark run primed a cache that every later run — including a
different process, or the same bench re-run at a different core count —
silently read instead of computing; that is cross-run result caching by
the measurement rules, so it is no longer a default.) At most
``_KEEP_NEWEST`` entries per kind are retained in a configured zone
(best-effort prune of the oldest — regenerated fixtures orphan their
predecessors' entries).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Prune cap PER KIND (ADVICE r11: a single global cap of 8 was exceeded by
#: 3 kinds × 3 fixtures in one session, evicting live entries a lazy
#: DataFrame still referenced). Per-kind, 8 concurrent fixtures per kind is
#: far above any real session's working set.
_KEEP_NEWEST = 8

#: Entries published after process start are NEVER pruned (VERDICT r11
#: what's-wrong #3): a lazy `spark.read.parquet` handed out earlier in this
#: process may not have materialized yet — count-pruning it would turn a
#: cache-management decision into a FileNotFoundException at action time.
_PROCESS_START = time.time()

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
    # The verified banded-MinHash pair table over the GATED corpus (the
    # quality+language+exact-dedup survivor set of
    # plans/corpus.py::corpus_gate_survivors) — the edge base
    # pipeline_corpus_build and pipeline_drop_reasons each rebuilt per
    # query before r12. The gates are deterministic per fixture, so the
    # table is fixture-pure. BUMP THIS VERSION whenever the gate semantics
    # in corpus_gate_survivors change — the builder code is shared, but
    # published entries carry the old gate's survivors until orphaned.
    "corpus_pairs": (("documents",), "v1"),
    # The seeded-hyperplane ANN index (vec_id, band buckets, norm — codes
    # only, never raw vectors; plans/similarity.py::hp_index_frame). The
    # md5-derived planes make it a pure function of the embeddings
    # fixture. BUMP THIS VERSION whenever HP_BANDS/BAND_BITS or the plane
    # derivation change.
    "hp_index": (("embeddings",), "v1"),
    # The per-document term-frequency index (doc_id, dl, tfs run-length
    # bags; plans/search.py::doc_tf_frame) — the shared retrieval index
    # five queries (bm25/tfidf/text_search_rank/search_prf/maxsim)
    # rebuilt map-side per query before r12. BUMP THIS VERSION whenever
    # the tokenization or RLE form changes.
    "doc_tf": (("documents",), "v1"),
}


def _build(kind: str, cat) -> DataFrame:
    if kind == "doc_pairs":
        from ..plans.dedup import banded_minhash_pairs

        return banded_minhash_pairs(cat.documents.select("doc_id", "text"))
    if kind == "corpus_pairs":
        from ..plans.corpus import corpus_gate_survivors
        from ..plans.dedup import banded_minhash_pairs

        return banded_minhash_pairs(
            corpus_gate_survivors(cat).select("doc_id", "text")
        )
    if kind == "hp_index":
        from ..plans.similarity import hp_index_frame

        return hp_index_frame(cat.embeddings)
    if kind == "doc_tf":
        from ..plans.search import doc_tf_frame

        return doc_tf_frame(cat.documents)
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


def _staging_root() -> str | None:
    """The configured staging zone, or None (the default: no staging —
    distillations are built inline and never persisted across runs)."""
    return os.environ.get("SPARK_GRAFT_STAGING_DIR") or None


def _tail_token(path: str, n: int = 64) -> bytes:
    """Last ``n`` bytes of a file — the cheap CONTENT token in the
    fingerprint (ADVICE r11: size+mtime alone collide under mtime-preserving
    copies — cp -p, rsync -t, snapshot restores). For parquet the tail is
    the footer (metadata length + magic preceded by encoded column stats /
    row counts), which changes whenever the data does; one 64-byte pread per
    file, no parquet parsing."""
    try:
        with open(path, "rb") as fh:
            fh.seek(-min(n, os.path.getsize(path)), os.SEEK_END)
            return fh.read(n)
    except OSError:
        return b""


def _file_stats(path: str):
    """(relpath, size, mtime_ns, tail) for a parquet file or directory tree."""
    if os.path.isfile(path):
        st = os.stat(path)
        yield (os.path.basename(path), st.st_size, st.st_mtime_ns, _tail_token(path))
        return
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(root, f)
            st = os.stat(p)
            yield (os.path.relpath(p, path), st.st_size, st.st_mtime_ns, _tail_token(p))


def fingerprint(sf_dir: str, kind: str) -> str:
    tables, version = _KINDS[kind]
    h = hashlib.sha256()
    h.update(os.path.realpath(sf_dir).encode())
    h.update(f"{kind}:{version}".encode())
    for table in tables:
        src = os.path.join(sf_dir, f"{table}.parquet")
        for rel, size, mtime, tail in _file_stats(src):
            h.update(f"{table}/{rel}:{size}:{mtime}:".encode())
            h.update(tail)
    return h.hexdigest()[:16]


def _prune(root: str) -> None:
    try:
        by_kind: dict[str, list[str]] = {}
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
                # dir name is f"{kind}-{fingerprint}"; kind itself has no
                # hyphens, so the cap groups correctly per kind.
                by_kind.setdefault(d.rsplit("-", 1)[0], []).append(path)
        for entries in by_kind.values():
            entries.sort(key=os.path.getmtime, reverse=True)
            for stale in entries[_KEEP_NEWEST:]:
                try:
                    if os.path.getmtime(stale) >= _PROCESS_START:
                        continue  # session-safety: see _PROCESS_START
                except OSError:
                    continue
                shutil.rmtree(stale, ignore_errors=True)
    except OSError:
        pass


def staged_edges(
    spark: SparkSession, sf_dir: str, kind: str, cut=None
) -> DataFrame:
    """The distilled edge table for ``kind``.

    Default (no staging zone configured): the distillation is returned as
    an INLINE plan over the base parquet tables — computed fresh inside
    each calling query, persisted nowhere. ``cut`` (optional callable,
    e.g. ``checkpoint_truncate`` / ``scratch_checkpoint`` / a persist) is
    applied to the inline frame for consumers that reference the
    distillation more than once or iterate over it; the materialization it
    forces happens inside the caller's own (timed) plan execution.

    With ``$SPARK_GRAFT_STAGING_DIR`` set (a real deployment's staging
    zone): built at most once per (fixture content, kind) and returned as
    a leaf parquet scan — the leaf itself is the materialization and
    lineage cut, so ``cut`` is skipped. The first caller pays the
    distillation + write; every later caller pays a leaf scan.
    """
    from ..catalog import Catalog

    root = _staging_root()
    if root is None:
        df = _build(kind, Catalog(spark, sf_dir))
        return cut(df) if cut is not None else df
    path = os.path.join(root, f"{kind}-{fingerprint(sf_dir, kind)}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        _build(kind, Catalog(spark, sf_dir)).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # Either a concurrent builder published first (target has
            # _SUCCESS — read the winner) or the target is a PARTIAL dir
            # (e.g. an interrupted rmtree left it non-empty without
            # _SUCCESS; ADVICE r11 medium): reading it would silently serve
            # wrong edge data forever. Verify the marker; on a partial,
            # clear the wreck and retry the publish once.
            if not os.path.exists(marker):
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    if not os.path.exists(marker):
                        shutil.rmtree(tmp, ignore_errors=True)
                        raise RuntimeError(
                            f"staged entry {path} is unpublishable: rename "
                            "failed twice and the target has no _SUCCESS "
                            "marker (partial directory?)"
                        )
            shutil.rmtree(tmp, ignore_errors=True)
        _prune(root)
    return spark.read.parquet(path)
