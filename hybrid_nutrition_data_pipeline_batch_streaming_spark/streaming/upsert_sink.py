"""Streaming keyed-upsert sink via foreachBatch (SURVEY.md §2.1 S4, §2.9 T7).

The reference's raw layer is a Cassandra table whose PRIMARY KEY makes every
INSERT a last-write-wins upsert (`consumer/consume_items.py:53,102-103`).
Structured Streaming's file sinks are append-only, so keyed upserts go
through ``foreachBatch``: each micro-batch is merged into the keyed store
with LWW semantics.

Store layout — a manifest-committed snapshot store (the Delta-log commit
pattern over plain parquet, dependency-free)::

    path/data/b{N}-v{V}/part-*.parquet   immutable bucket snapshots
    path/_manifest/v{V:06d}.json         {"version": V, "buckets": {N: dir}}

Buckets are hash partitions of the key space (N = pmod(xxhash64(key),
n_buckets)), so a merge

- reads ONLY the buckets the micro-batch touches (the manifest maps bucket
  id → current snapshot dir — O(touched buckets), not O(store));
- writes new immutable snapshot dirs for those buckets, leaving every other
  bucket's files byte-identical;
- COMMITS by renaming one complete manifest file into place — the single
  atomic visibility point. A crash anywhere before the rename leaves the
  previous manifest (and therefore a fully consistent store) in effect;
  orphaned data dirs are garbage-collected by later merges. This is
  transactional ACROSS buckets, which round 1's per-bucket dir promotion
  was not.

Because every manifest is a COMPLETE bucket map, any retained version is
directly readable — ``read(version=N)`` is snapshot time travel with no log
replay, ``history()`` lists versions, and ``vacuum(keep_last=K)`` bounds
disk growth by dropping old manifests plus the snapshot dirs only they
referenced (the merge-time GC keeps every dir a retained manifest needs).

Within one stream, foreachBatch serializes micro-batches; ACROSS writers the
manifest commit is put-if-absent (``os.link``), so a racing commit raises
``ConcurrentWriteError`` instead of silently losing an update — optimistic
concurrency, the contended-commit contract of a Delta log. In production the
same semantics come from a Delta/Iceberg ``MERGE INTO``.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import dedup_last_write_wins

BUCKET_COL = "bucket"

#: Snapshot dir name: b{bucket}-v{version}[-{attempt}]. The version component
#: lets GC distinguish decided versions from in-flight attempts.
_SNAP_RE = re.compile(r"^b\d+-v(\d+)")


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this manifest version first. The store is
    untouched by the losing attempt (its data dirs are unreferenced and
    will be GC'd); re-invoke ``merge`` to rebase the batch on the winner's
    snapshot."""


class ParquetUpsertStore:
    """A keyed store with last-write-wins merge semantics: hash-bucketed so
    merges scale with the micro-batch, manifest-committed so every reader
    sees a single consistent snapshot."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        ts_col: str,
        n_buckets: int = 16,
        merge_schema: bool = False,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.ts_col = ts_col
        self.n_buckets = n_buckets
        #: Delta-style mergeSchema: opt-in column evolution on merge();
        #: reads always footer-merge so mixed-schema buckets stay readable.
        self.merge_schema = merge_schema

    # -- layout helpers -----------------------------------------------------

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifest")

    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)).cast("int")

    def _versions(self) -> list[int]:
        """Committed manifest versions, ascending."""
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(
            int(name[1:-5])
            for name in os.listdir(self._manifest_dir)
            if name.startswith("v") and name.endswith(".json")
        )

    def _load_manifest(self, version: int) -> dict[int, str]:
        if version == 0:
            # The pre-commit store: a valid, empty snapshot (read() treats it
            # the same way), so changes(0, N) diffs the first commit as pure
            # inserts instead of raising FileNotFoundError.
            return {}
        path = os.path.join(self._manifest_dir, f"v{version:06d}.json")
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"store at {self.path!r} has no committed version {version} "
                f"(retained: {self._versions()}) — it may have been vacuumed"
            )
        with open(path) as fh:
            doc = json.load(fh)
        return {int(b): d for b, d in doc["buckets"].items()}

    def _current_manifest(self) -> tuple[int, dict[int, str]]:
        """(version, bucket id → snapshot dir name). (0, {}) before the
        first commit. Manifests are written whole and renamed into place,
        so any file present here is complete."""
        versions = self._versions()
        if not versions:
            return 0, {}
        return versions[-1], self._load_manifest(versions[-1])

    def _commit_manifest(self, version: int, buckets: dict[int, str]) -> None:
        """The atomic commit point: write the complete manifest to a temp
        name, fsync, then ``link`` into place — link (unlike rename) FAILS
        if the target exists, so racing writers get compare-and-swap
        semantics instead of a silent lost update (the same contended-commit
        contract as a Delta log; on object stores this maps to
        put-if-absent)."""
        os.makedirs(self._manifest_dir, exist_ok=True)
        final = os.path.join(self._manifest_dir, f"v{version:06d}.json")
        tmp = os.path.join(self._manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(
                {"version": version, "buckets": {str(b): d for b, d in buckets.items()}},
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)  # atomic put-if-absent on POSIX
        except FileExistsError as exc:
            raise ConcurrentWriteError(
                f"version {version} was committed by another writer; "
                "re-run merge to rebase on the current snapshot"
            ) from exc
        finally:
            os.unlink(tmp)

    def _referenced_dirs(self) -> set[str]:
        """Every snapshot dir any RETAINED manifest points at — the live set
        for GC. Older manifests keep their dirs alive (time travel) until
        ``vacuum`` drops the manifests themselves."""
        refs: set[str] = set()
        for v in self._versions():
            refs.update(self._load_manifest(v).values())
        return refs

    def _gc_unreferenced(self, include_stages: bool = False) -> None:
        """Drop data dirs no retained manifest references (left by
        pre-commit crashes, or stranded when vacuum removed the last
        manifest that referenced them). Best-effort — a failure here never
        affects correctness, only disk usage.

        Concurrency guard: an unreferenced snapshot dir whose version is
        AHEAD of the current committed version may belong to another
        writer's in-flight attempt (renamed but not yet committed) — GC
        skips it; it becomes collectable as soon as that version is decided
        (the attempt either committed a manifest referencing it, or lost
        the race and its uniquely-named dirs stay unreferenced).
        ``.stage-*`` workspaces are owned (and removed) by their attempt;
        only ``vacuum`` — an administrative call, documented as not
        concurrent with writers — sweeps crashed leftovers of those."""
        if not os.path.isdir(self._data_dir):
            return
        current, _ = self._current_manifest()
        referenced = self._referenced_dirs()
        for name in os.listdir(self._data_dir):
            if name in referenced:
                continue
            if name.startswith("."):
                if include_stages:
                    shutil.rmtree(os.path.join(self._data_dir, name), ignore_errors=True)
                continue
            m = _SNAP_RE.match(name)
            if m is not None and int(m.group(1)) > current:
                continue  # possibly an in-flight attempt at the next version
            shutil.rmtree(os.path.join(self._data_dir, name), ignore_errors=True)

    # -- public API ---------------------------------------------------------

    def exists(self) -> bool:
        return bool(self._current_manifest()[1])

    def _bucket_paths(self, buckets: dict[int, str], ids: list[int] | None = None) -> list[str]:
        wanted = buckets if ids is None else {b: buckets[b] for b in ids if b in buckets}
        return [os.path.join(self._data_dir, d) for d in wanted.values()]

    def read(self, version: int | None = None) -> DataFrame | None:
        """The committed snapshot, or None if no merge has committed yet.

        ``version`` pins a historical snapshot (time travel): each manifest
        is a complete bucket map, so any retained version reads directly —
        no log replay. Raises if the version was vacuumed; existence comes
        from the manifest (never inferred from a swallowed read error — a
        transient/corruption failure must surface, not silently reset the
        store to empty)."""
        if version is None:
            _, buckets = self._current_manifest()
        else:
            buckets = self._load_manifest(version)
        if not buckets:
            return None
        return self.spark.read.option("mergeSchema", "true").parquet(
            *self._bucket_paths(buckets)
        )

    def read_keys(self, keys: list, version: int | None = None) -> DataFrame | None:
        """Point lookups by primary key — the reference's Cassandra PK read
        path (`consumer/consume_items.py:50-58`: PRIMARY KEY item_name
        routes a read to one partition). Each requested key hashes to its
        bucket and ONLY those bucket dirs are opened, then an exact filter
        keeps the requested keys — O(requested buckets) I/O, never
        O(store), at any store size.

        ``keys`` must be a BOUNDED list of values of the key column's type
        (a point-lookup API, not a join); the bucket ids are computed with
        the same xxhash64 expression the writer uses, via one tiny local
        job over the key list (no store data touched). For an unbounded
        key set, join ``read()`` instead. Returns None when the store has
        never committed."""
        if version is None:
            _, buckets = self._current_manifest()
        else:
            buckets = self._load_manifest(version)
        if not buckets:
            return None
        kdf = self.spark.createDataFrame([(k,) for k in keys], [self.key])
        wanted = sorted(
            {r[0] for r in kdf.select(self._bucket()).distinct().collect()}
        )
        paths = self._bucket_paths(buckets, wanted)
        if not paths:
            # None of the requested keys' buckets exist in this snapshot.
            return self.read(version=version).where(F.lit(False))
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*paths)
            .where(F.col(self.key).isin(keys))
        )

    def _changed_buckets(self, v_from: int, v_to: int) -> list[int]:
        """Bucket ids whose snapshot dir differs between two versions — the
        manifest diff, no data I/O at all."""
        mf = self._load_manifest(v_from)
        mt = self._load_manifest(v_to)
        # buckets present only in mf were fully emptied by a delete()
        return sorted(
            {b for b in mt if mf.get(b) != mt[b]} | {b for b in mf if b not in mt}
        )

    def changes(self, v_from: int, v_to: int) -> DataFrame | None:
        """Row-level change feed between two committed versions (CDF).

        Because a bucket's snapshot dir name changes iff its contents
        changed, the manifest diff bounds the read to TOUCHED buckets —
        O(changed data), never O(store), no matter how far apart the
        versions are. Within those buckets, a left join of the new snapshot
        against the old on the key classifies each row: ``insert`` (key
        absent before) or ``update`` (the stored row changed — a NULL-SAFE
        comparison of the full pre/post structs, so value changes that
        carry an equal or NULL timestamp still surface); a third anti-join
        leg surfaces ``delete`` rows (key present before, gone after — the
        ``delete()`` path), carrying the pre-image values in the data
        columns the way Delta's CDF does. ``changes(0,
        N)`` diffs against the empty pre-commit store — the first commit
        reads as pure inserts. Returns the
        post-image plus ``change_type`` and a ``pre_image`` struct (NULL
        for inserts) — pre-images let a downstream incremental view
        RETRACT the replaced contribution and add the new one instead of
        recomputing from the full store. None if nothing changed."""
        changed = self._changed_buckets(v_from, v_to)
        if not changed:
            return None
        mf = self._load_manifest(v_from)
        mt = self._load_manifest(v_to)
        old_paths = [
            os.path.join(self._data_dir, mf[b]) for b in changed if b in mf
        ]
        new_paths = [
            os.path.join(self._data_dir, mt[b]) for b in changed if b in mt
        ]
        if not new_paths:
            # every changed bucket was emptied — the diff is pure deletes
            old_full = self.spark.read.parquet(*old_paths)
            return old_full.select(
                "*",
                F.lit("delete").alias("change_type"),
                F.struct(*[F.col(c) for c in old_full.columns]).alias("pre_image"),
            )
        new = self.spark.read.parquet(*new_paths)
        pre_type = f"struct<{','.join(f'{c}:{t}' for c, t in new.dtypes)}>"
        if not old_paths:
            return new.select(
                "*",
                F.lit("insert").alias("change_type"),
                F.lit(None).cast(pre_type).alias("pre_image"),
            )
        old_full = self.spark.read.parquet(*old_paths)
        # Field order matches the post struct — struct comparison is
        # positional.
        old = old_full.select(
            F.col(self.key).alias("__old_key"),
            F.struct(*[F.col(c) for c in new.columns]).alias("__pre"),
        )
        joined = new.join(
            old, new[self.key] == old["__old_key"], "left"
        )
        post = F.struct(*[new[c] for c in new.columns])
        upserts = joined.select(
            *[new[c] for c in new.columns],
            F.when(F.col("__old_key").isNull(), F.lit("insert"))
            .when(~post.eqNullSafe(F.col("__pre")), F.lit("update"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
            F.when(F.col("__old_key").isNull(), F.lit(None).cast(pre_type))
            .otherwise(F.col("__pre"))
            .alias("pre_image"),
        ).where(F.col("change_type") != "unchanged")
        deletes = old_full.join(
            new.select(F.col(self.key).alias("__new_key")),
            old_full[self.key] == F.col("__new_key"),
            "left_anti",
        ).select(
            *[old_full[c] for c in new.columns],
            F.lit("delete").alias("change_type"),
            F.struct(*[old_full[c] for c in new.columns]).alias("pre_image"),
        )
        return upserts.unionByName(deletes)

    def history(self) -> list[int]:
        """Committed versions available to ``read(version=...)``,
        ascending — the store's ``DESCRIBE HISTORY``."""
        return self._versions()

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` manifests, then GC
        snapshot dirs no retained manifest references. Returns the dropped
        versions. Bounds time-travel disk growth the same way Delta's
        VACUUM does; the current snapshot is never touched."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (the live snapshot)")
        versions = self._versions()
        dropped = versions[:-keep_last]
        for v in dropped:
            os.remove(os.path.join(self._manifest_dir, f"v{v:06d}.json"))
        self._gc_unreferenced(include_stages=True)
        return dropped

    def _read_buckets(self, ids: list[int]) -> DataFrame | None:
        _, buckets = self._current_manifest()
        paths = self._bucket_paths(buckets, ids)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def merge(self, batch: DataFrame) -> None:
        """LWW-merge one micro-batch: read touched buckets, union, dedup,
        write new snapshot dirs, commit one manifest.

        Every on-disk name this attempt creates is ATTEMPT-UNIQUE
        (``.stage-{attempt}`` workspace, ``b{b}-v{V}-{attempt}`` snapshot
        dirs), and nothing pre-existing is ever deleted before the commit —
        so two merges racing from the same base version never touch each
        other's files; the put-if-absent manifest link alone decides the
        winner, and the loser's dirs (removed on the spot, or by later GC)
        were never visible to any reader."""
        with_bucket = batch.withColumn(BUCKET_COL, self._bucket())
        # Driver-side list of touched bucket ids — bounded by n_buckets,
        # never by data volume.
        touched = sorted(
            r[0]
            for r in with_bucket.select(BUCKET_COL).distinct().collect()
            if r[0] is not None
        )
        if not touched:
            return
        version, buckets = self._current_manifest()
        current = self._read_buckets(touched)
        if current is None:
            merged = batch
        elif self.merge_schema:
            # Delta-style mergeSchema: a producer upgrade adds columns; old
            # rows surface NULL for them. TOUCHED buckets rewrite with the
            # union schema immediately; untouched buckets keep their old
            # files, and read() merges footers (mergeSchema=true) so the
            # store-wide view is consistent without a full rewrite.
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            # strict default: a schema drift is an error, never silent
            merged = current.unionByName(batch)
        deduped = dedup_last_write_wins(merged, key=self.key, ts=self.ts_col)
        new_version = version + 1
        attempt = uuid.uuid4().hex[:8]
        stage = os.path.join(self._data_dir, f".stage-{attempt}")
        renamed: list[str] = []
        try:
            (
                deduped.withColumn(BUCKET_COL, self._bucket())
                .repartition(len(touched), BUCKET_COL)
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(stage)
            )
            new_buckets = dict(buckets)
            for b in touched:
                stage_dir = os.path.join(stage, f"{BUCKET_COL}={b}")
                if not os.path.isdir(stage_dir):
                    continue  # no surviving rows for this bucket (can't happen under LWW)
                snap = f"b{b}-v{new_version:06d}-{attempt}"
                dst = os.path.join(self._data_dir, snap)
                os.rename(stage_dir, dst)
                renamed.append(dst)
                new_buckets[b] = snap
            try:
                self._commit_manifest(new_version, new_buckets)  # ← visibility point
            except ConcurrentWriteError:
                # Lost the race: the winner's store state is untouched (our
                # names are unique); drop our never-visible dirs and let the
                # caller rebase.
                for d in renamed:
                    shutil.rmtree(d, ignore_errors=True)
                raise
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        self._gc_unreferenced()

    def delete(self, keys: DataFrame) -> int:
        """Key-targeted delete (GDPR / right-to-be-forgotten): rewrite ONLY
        the buckets the keys hash into, anti-joining them out, and commit a
        new manifest version — O(touched buckets), never O(store). A bucket
        left empty drops out of the manifest entirely. Time travel still
        serves pre-delete versions until ``vacuum()`` removes them — the
        physical-erasure step a real forgetting workflow must run (same
        two-phase contract as Delta DELETE + VACUUM). Returns the number of
        rows removed; no-op (no new version) when nothing matched.

        Concurrency: same attempt-unique staging + put-if-absent manifest
        commit as ``merge()`` — a racing writer loses loudly with
        ConcurrentWriteError and the store stays consistent."""
        key_df = keys.select(F.col(self.key)).distinct()
        touched = sorted(
            r[0]
            for r in key_df.withColumn(BUCKET_COL, self._bucket())
            .select(BUCKET_COL)
            .distinct()
            .collect()
            if r[0] is not None
        )
        if not touched:
            return 0
        version, buckets = self._current_manifest()
        current = self._read_buckets(touched)
        if current is None:
            return 0
        survivors = current.join(key_df, on=self.key, how="left_anti")
        n_before = current.count()
        n_after = survivors.count()
        if n_after == n_before:
            return 0  # nothing matched: don't burn a version
        new_version = version + 1
        attempt = uuid.uuid4().hex[:8]
        stage = os.path.join(self._data_dir, f".stage-{attempt}")
        renamed: list[str] = []
        try:
            (
                survivors.withColumn(BUCKET_COL, self._bucket())
                .repartition(len(touched), BUCKET_COL)
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(stage)
            )
            new_buckets = dict(buckets)
            for b in touched:
                stage_dir = os.path.join(stage, f"{BUCKET_COL}={b}")
                if not os.path.isdir(stage_dir):
                    new_buckets.pop(b, None)  # bucket fully emptied
                    continue
                snap = f"b{b}-v{new_version:06d}-{attempt}"
                dst = os.path.join(self._data_dir, snap)
                os.rename(stage_dir, dst)
                renamed.append(dst)
                new_buckets[b] = snap
            try:
                self._commit_manifest(new_version, new_buckets)
            except ConcurrentWriteError:
                for d in renamed:
                    shutil.rmtree(d, ignore_errors=True)
                raise
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        self._gc_unreferenced()
        return n_before - n_after


def upsert_stream(
    stream: DataFrame,
    store: ParquetUpsertStore,
    checkpoint: str,
):
    """Run a stream into the keyed store with exactly-once micro-batches:
    checkpoint tracks which batches merged, foreachBatch applies the LWW
    merge — together they re-create the reference's Cassandra upsert
    without its racy read-modify-write (`pipeline.py:144-150`)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        store.merge(batch)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
