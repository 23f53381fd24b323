"""Vendored Iceberg-style snapshot commit protocol for parquet table dirs.

SURVEY.md §2.1 prescribes a transactional table format (Iceberg) for the K1
routed fan-out and the K5/K6 library upserts (reference analog: SQLite's
single-writer transactions, sqlite-template-manager.ts:90-147). Real Iceberg
cannot be vendored into this sandbox, so this module implements the part of
its design the pipeline actually needs — SNAPSHOT ISOLATION via immutable
data files plus an atomic metadata commit — with zero dependencies:

    <root>/
      _snapshots/v000000000001.json   immutable manifest per snapshot
      _CURRENT_HINT                   fast-path pointer (hint only)
      data-v000000000001-<hex>/       immutable parquet dir(s), one per commit

Protocol (Iceberg's, minus the catalog):

- Data is staged first, into a fresh uniquely-named directory that no
  committed manifest references. A crash mid-write leaves an orphan dir that
  ``vacuum`` collects; readers never see it.
- The COMMIT POINT is the exclusive creation (``os.link`` of a fsync'd temp
  file — atomic on POSIX) of ``_snapshots/v{N}.json``. Two committers racing
  for version N: exactly one link succeeds; the loser rebases on the winner's
  snapshot and retries with N+1 (optimistic concurrency, like Iceberg's
  catalog swap).
- The current version is the max committed manifest (a directory listing —
  Iceberg's version-hint.text is likewise only a hint); ``_CURRENT_HINT`` is
  best-effort and never trusted over the listing.
- Manifests are immutable and reference their full data-dir list, so any
  retained snapshot is readable (time travel) and ``vacuum`` can delete
  exactly the dirs no retained manifest references.

``merge`` gives the MERGE INTO upsert K5 needs: read the current snapshot,
upsert by key (library_ops.merge_templates semantics), commit the result as a
new snapshot — a concurrent commit between read and publish is detected at
the commit point and the merge replays against the new current.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_snapshots"
_HINT = "_CURRENT_HINT"
FORMAT = "lpcs-snapshot-v1"


class ConcurrentCommitError(RuntimeError):
    """Another committer published this version first; rebase and retry."""


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root

    # -- metadata -----------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _MANIFEST_DIR, f"v{version:012d}.json")

    def current_version(self) -> int | None:
        """Max committed manifest version; the listing is authoritative
        (manifest creation is the atomic commit point), the hint file is not."""
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        if not os.path.isdir(mdir):
            return None
        versions = [
            int(name[1:13])
            for name in os.listdir(mdir)
            if name.startswith("v") and name.endswith(".json") and name[1:13].isdigit()
        ]
        return max(versions, default=None)

    def manifest(self, version: int | None = None) -> dict | None:
        if version is None:
            version = self.current_version()
            if version is None:
                return None
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        if not os.path.isdir(mdir):
            return []
        return [self.manifest(int(n[1:13])) for n in sorted(os.listdir(mdir)) if n.endswith(".json")]

    @staticmethod
    def is_snapshot_dir(root: str) -> bool:
        return os.path.isdir(os.path.join(root, _MANIFEST_DIR))

    # -- read ---------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """DataFrame over exactly the data dirs of one committed snapshot
        (default: current). Each dir discovers its own partition columns; the
        dir count is bounded by vacuum, so the union stays shallow."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        dfs = [spark.read.parquet(os.path.join(self.root, d)) for d in m["data_dirs"]]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    # -- write --------------------------------------------------------------

    def _stage(self, df: DataFrame, partition_by: tuple[str, ...] | None) -> str:
        """Write ``df`` into a fresh dir no manifest references (crash ⇒ orphan,
        collected by vacuum — never visible to readers)."""
        name = f"data-{uuid.uuid4().hex[:12]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.root, name))
        return name

    def _try_commit(
        self,
        parent: int | None,
        op: str,
        data_dirs: list[str],
        summary: dict,
        dir_batches: dict[str, int] | None = None,
    ) -> int:
        version = 0 if parent is None else parent + 1
        manifest = {
            "format": FORMAT,
            "version": version,
            "parent": parent,
            "operation": op,
            "data_dirs": data_dirs,
            "summary": summary,
        }
        if dir_batches is not None:
            manifest["dir_batches"] = dir_batches
        os.makedirs(os.path.join(self.root, _MANIFEST_DIR), exist_ok=True)
        final = self._manifest_path(version)
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic exclusive create: THE commit point
        except FileExistsError:
            raise ConcurrentCommitError(f"snapshot v{version} already committed")
        finally:
            os.unlink(tmp)
        hint_tmp = os.path.join(self.root, f".{_HINT}.tmp")
        with open(hint_tmp, "w") as f:
            f.write(f"v{version:012d}")
        os.replace(hint_tmp, os.path.join(self.root, _HINT))
        return version

    def commit_overwrite(
        self,
        df: DataFrame,
        partition_by: tuple[str, ...] | None = None,
        expected_parent: int | None = None,
        retries: int = 5,
    ) -> int:
        """Publish ``df`` as the new current snapshot (replaces all rows).

        ``expected_parent``: fail rather than clobber if another committer
        advanced the table past that version (compare-and-swap semantics);
        with the default None, latest-overwrite-wins and a version race just
        retries on top of the winner.
        """
        staged = self._stage(df, partition_by)
        for _ in range(retries):
            parent = self.current_version()
            if expected_parent is not None and parent != expected_parent:
                raise ConcurrentCommitError(
                    f"expected parent v{expected_parent}, table is at v{parent}"
                )
            try:
                return self._try_commit(parent, "overwrite", [staged], {})
            except ConcurrentCommitError:
                if expected_parent is not None:
                    raise
        raise ConcurrentCommitError(f"gave up after {retries} racing commits")

    def commit_append(
        self, df: DataFrame, partition_by: tuple[str, ...] | None = None, retries: int = 5
    ) -> int:
        """Append ``df`` as a new snapshot = parent's data dirs + one new dir.
        Losing a version race rebases on the winner's dir list and retries —
        both appends survive, in commit order."""
        staged = self._stage(df, partition_by)
        for _ in range(retries):
            parent = self.current_version()
            base: list[str] = []
            tags: dict[str, int] = {}
            if parent is not None:
                m = self.manifest(parent)
                base = m["data_dirs"]
                # carry the parent's batch tags forward — dropping them would
                # let a later commit_batch retry miss its own prior dir and
                # duplicate that micro-batch's rows
                tags = {d: b for d, b in m.get("dir_batches", {}).items() if d in base}
            try:
                return self._try_commit(parent, "append", base + [staged], {}, tags or None)
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(f"gave up after {retries} racing commits")

    def commit_batch(
        self,
        df: DataFrame,
        batch_id: int,
        partition_by: tuple[str, ...] | None = None,
        retries: int = 5,
    ) -> int:
        """Idempotent per-micro-batch append for at-least-once sinks
        (Structured Streaming ``foreachBatch``): the new snapshot keeps the
        parent's dirs EXCEPT any previously committed for this ``batch_id``
        and adds one new dir tagged with it. A retried micro-batch therefore
        REPLACES its own prior output instead of duplicating rows, and a
        crash before the commit point leaves only an unreferenced staged dir
        (age-gated vacuum) — readers never observe a torn batch."""
        staged = self._stage(df, partition_by)
        for _ in range(retries):
            parent = self.current_version()
            tags: dict[str, int] = {}
            base: list[str] = []
            if parent is not None:
                m = self.manifest(parent)
                ptags = m.get("dir_batches", {})
                for d in m["data_dirs"]:
                    if ptags.get(d) != batch_id:
                        base.append(d)
                        if d in ptags:
                            tags[d] = ptags[d]
            tags[staged] = batch_id
            try:
                return self._try_commit(
                    parent, "append-batch", base + [staged], {"batch_id": batch_id}, tags
                )
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(f"gave up after {retries} racing commits")

    def merge(
        self, spark: SparkSession, updates: DataFrame, key: str = "template_id", retries: int = 5
    ) -> int:
        """MERGE INTO stand-in with snapshot isolation (K5): same-key rows are
        replaced, new keys union through, the result commits atomically. A
        commit that lands between our read and our publish is detected at the
        commit point and the merge REPLAYS against the new current snapshot —
        never lost-update."""
        from log_parser_cli_spark.plans.library_ops import merge_templates

        for _ in range(retries):
            parent = self.current_version()
            merged = updates if parent is None else merge_templates(self.read(spark, parent), updates, key)
            staged = self._stage(merged, None)
            try:
                return self._try_commit(parent, "merge", [staged], {"key": key})
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(f"gave up after {retries} racing commits")

    # -- maintenance --------------------------------------------------------

    def vacuum(self, keep_last: int = 2, orphan_grace_s: float = 3600.0) -> list[str]:
        """Delete data dirs referenced by no retained snapshot, plus expired
        manifests and leftover manifest temp files. Keeping ≥2 snapshots
        leaves the previous version readable for in-flight readers (the
        sandbox stand-in for a retention window).

        Unreferenced dirs split into two classes:

        - referenced by an EXPIRED manifest only → committed and superseded,
          safe to delete immediately;
        - referenced by NO manifest at all → either a crashed commit's orphan
          OR a CONCURRENT committer's staged-but-not-yet-committed dir. The
          two are indistinguishable from here, so collection is age-gated by
          ``orphan_grace_s`` (Iceberg's remove_orphan_files takes the same
          posture with its 3-day default) — auto-vacuum right after a commit
          can no longer delete a racing committer's staged data out from
          under it.
        """
        import time

        current = self.current_version()
        if current is None:
            return []
        keep_last = max(1, keep_last)  # keep_last <= 0 would vacuum the CURRENT snapshot
        retained_versions = [v for v in (current - i for i in range(keep_last)) if v >= 0]
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        committed: set[str] = set()  # referenced by ANY existing manifest
        retained: set[str] = set()  # referenced by a RETAINED manifest
        for name in os.listdir(mdir):
            if not (name.startswith("v") and name.endswith(".json") and name[1:13].isdigit()):
                continue
            v = int(name[1:13])
            try:
                dirs = self.manifest(v)["data_dirs"]
            except FileNotFoundError:
                continue  # expired manifest deleted by a concurrent vacuum
            committed.update(dirs)
            if v in retained_versions or v > current:
                # v > current: committed by a concurrent writer AFTER we
                # sampled current_version() — it is the table's NEWEST
                # snapshot, not an expired one; deleting its data dirs here
                # would break the very snapshot readers are about to see
                retained.update(dirs)
        now = time.time()
        removed = []
        for name in os.listdir(self.root):
            if not name.startswith("data-") or name in retained:
                continue
            path = os.path.join(self.root, name)
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue  # deleted under us (concurrent vacuum)
            if name in committed or age >= orphan_grace_s:
                shutil.rmtree(path, ignore_errors=True)
                removed.append(name)
        for name in os.listdir(mdir):
            path = os.path.join(mdir, name)
            is_manifest = name.startswith("v") and name.endswith(".json") and name[1:13].isdigit()
            if is_manifest and int(name[1:13]) < min(retained_versions):
                try:
                    os.unlink(path)
                except OSError:
                    pass  # unlinked by a concurrent vacuum
            elif name.endswith(".tmp"):
                # crashed _try_commit between temp-write and finally-unlink;
                # age-gated because a live committer's temp exists briefly
                try:
                    if now - os.path.getmtime(path) >= orphan_grace_s:
                        os.unlink(path)
                except OSError:
                    pass
        return removed
