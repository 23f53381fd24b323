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

    def _try_commit(self, parent: int | None, op: str, data_dirs: list[str], summary: dict) -> int:
        version = 0 if parent is None else parent + 1
        manifest = {
            "format": FORMAT,
            "version": version,
            "parent": parent,
            "operation": op,
            "data_dirs": data_dirs,
            "summary": summary,
        }
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
            base = self.manifest(parent)["data_dirs"] if parent is not None else []
            try:
                return self._try_commit(parent, "append", base + [staged], {})
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

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete data dirs referenced by no retained snapshot, plus orphan
        stage dirs from crashed commits, plus expired manifests. Keeping ≥2
        snapshots leaves the previous version readable for in-flight readers
        (the sandbox stand-in for a retention window)."""
        current = self.current_version()
        if current is None:
            return []
        retained_versions = [
            v for v in (self.manifest()["version"] - i for i in range(keep_last)) if v >= 0
        ]
        referenced: set[str] = set()
        for v in retained_versions:
            if os.path.exists(self._manifest_path(v)):
                referenced.update(self.manifest(v)["data_dirs"])
        removed = []
        for name in os.listdir(self.root):
            if name.startswith("data-") and name not in referenced:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
                removed.append(name)
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        for name in os.listdir(mdir):
            if name.endswith(".json") and int(name[1:13]) < min(retained_versions):
                os.unlink(os.path.join(mdir, name))
        return removed
