"""Versioned parquet tables: snapshot isolation + time travel over a
plain object store, no table-format jars.

The reference's warehouse is Snowflake, whose TRUNCATE+INSERT refreshes
(snowflake_refresh.py:5-80) ride on snapshot isolation and Time Travel.
A bare parquet directory has neither: an overwrite is visibly
non-atomic (readers can see a half-deleted directory) and history is
gone. Delta/Iceberg solve this with a manifest log — and that core idea
needs no jar, so this module implements the minimal version of it:

- data files are immutable, written once under ``<table>/data/`` with
  unique names;
- a commit is ONE atomic filesystem rename of a manifest JSON into
  ``<table>/_manifests/v{N}.json`` listing exactly the files of that
  snapshot (plus the schema and a commit message);
- readers resolve the latest (or any historical) manifest and read
  exactly its files — never a directory glob, so concurrent writers
  can't tear a read;
- old versions stay readable until ``vacuum`` removes files no
  manifest within the retention set references.

Single-writer per table (the reference's Airflow DAG serializes writes
the same way); what the manifest buys is reader-vs-writer isolation and
history, not full multi-writer OCC — documented boundary, same spirit
as KAFKA.md. Two loud guards cover the realistic violations of that
boundary (r5 advisor finding — maintenance jobs racing the ingest
writer): ``commit(expect_version=...)`` rejects a commit derived from a
stale snapshot, and the commit point itself is a link(2), so two
writers racing to the same version number get ``ConcurrentCommitError``
instead of one silently clobbering the other's manifest.

Scale: a commit's driver-side cost is listing the files it just wrote
(one object-store LIST of the staging prefix) + one small JSON PUT +
rename; readers load one JSON. Data volume never rewrites on commit —
overwrite semantics only swap the file LIST, not the files.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer committed between deriving a snapshot and
    committing its result — the caller must re-derive and retry."""


class VersionedTable:
    """Manifest-versioned parquet table rooted at ``path``."""

    def __init__(self, path: str):
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifests")
        self._data_dir = os.path.join(path, "data")

    # ---- inspection ----------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for name in os.listdir(self._manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """Commit log, oldest first: (version, ts, message, n_files)."""
        return [
            {
                "version": v,
                "committed_at": m["committed_at"],
                "message": m.get("message", ""),
                "n_files": len(m["files"]),
            }
            for v in self.versions()
            for m in [self.manifest(v)]
        ]

    # ---- write path ----------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        *,
        mode: str = "overwrite",
        message: str = "",
        expect_version: int | None | str = "any",
    ) -> int:
        """Write ``df``'s files immutably and atomically commit a new
        snapshot. ``mode='overwrite'`` → the new snapshot is exactly the
        new files; ``mode='append'`` → new files plus the previous
        snapshot's files (no data rewrite either way).

        ``expect_version`` is optimistic concurrency control (the
        Delta/Iceberg commit contract): pass the snapshot version the
        write was derived from and the commit raises
        ``ConcurrentCommitError`` if another commit landed in between —
        instead of silently clobbering it (r5 advisor finding: a
        maintenance compaction racing the ingest writer dropped the
        interleaved append from the new snapshot). The default ``"any"``
        keeps the documented single-writer fast path. Same-version
        manifest collisions are loud regardless: the commit point is a
        link(2), which fails on an existing manifest rather than
        overwriting it.

        The stale-snapshot check runs BOTH before the staged write
        (cheap: a doomed commit skips the data write entirely) and
        after it (the race can land mid-write); a post-write rejection
        removes its own staging prefix, so a failed commit leaves no
        orphaned data files (round-6 advisor finding)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, not {mode!r}")
        if expect_version != "any":
            pre = self.latest_version()
            if pre != expect_version:
                raise ConcurrentCommitError(
                    f"commit derived from version {expect_version!r} but "
                    f"latest is now {pre!r} — another writer committed in "
                    "between; re-derive from the current snapshot and retry"
                )
        staging = os.path.join(self._data_dir, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(staging)
        files = sorted(
            os.path.join(staging, f)
            for f in os.listdir(staging)
            if f.endswith(".parquet")
        )
        prev = self.latest_version()
        if expect_version != "any" and prev != expect_version:
            self._drop_staging(staging)
            raise ConcurrentCommitError(
                f"commit derived from version {expect_version!r} but latest "
                f"is now {prev!r} — another writer committed in between; "
                "re-derive from the current snapshot and retry "
                "(staged files cleaned up)"
            )
        if mode == "append" and prev is not None:
            files = self.manifest(prev)["files"] + files
        version = 0 if prev is None else prev + 1
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "message": message,
            "schema": df.schema.json(),
            "files": files,
        }
        os.makedirs(self._manifest_dir, exist_ok=True)
        tmp = os.path.join(self._manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        final = os.path.join(self._manifest_dir, f"v{version}.json")
        try:
            os.link(tmp, final)  # the atomic commit point — loud on collision
        except FileExistsError:
            os.unlink(tmp)
            self._drop_staging(staging)
            raise ConcurrentCommitError(
                f"version {version} was committed concurrently at {final} "
                "(staged files cleaned up)"
            ) from None
        os.unlink(tmp)
        return version

    @staticmethod
    def _drop_staging(staging: str) -> None:
        """Best-effort removal of a rejected commit's staging prefix —
        never raises over the ConcurrentCommitError it accompanies."""
        import shutil

        shutil.rmtree(staging, ignore_errors=True)

    # ---- read path -----------------------------------------------------

    def read(self, spark: SparkSession, *, version: int | None = None) -> DataFrame:
        """Read a snapshot (latest by default, or time-travel to any
        retained ``version``): exactly the manifest's files, never a
        directory glob."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self.manifest(v)
        if not m["files"]:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType.fromJson(json.loads(m["schema"])))
        return spark.read.parquet(*m["files"])

    # ---- maintenance ---------------------------------------------------

    def compact(self, spark: SparkSession, *, target_files: int = 1) -> int:
        """Small-files compaction: rewrite the LATEST snapshot into
        ``target_files`` parquet files and commit the result as a new
        version (content-identical, fewer files). The append path
        accumulates one-file-per-micro-batch at streaming cadence —
        the classic small-files problem; compaction is the maintenance
        pass that keeps scan parallelism healthy without breaking time
        travel (old versions still reference the original files until
        vacuum retires them). Returns the new version number."""
        v = self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        df = self.read(spark, version=v).coalesce(max(1, target_files))
        # expect_version: an append landing between this read and the
        # overwrite commit fails loudly instead of being clobbered
        return self.commit(
            df, mode="overwrite", message=f"compact v{v}", expect_version=v
        )

    def vacuum(
        self, *, keep_last: int = 2, grace_seconds: float = 3600.0
    ) -> list[str]:
        """Delete data files referenced by NO retained manifest and drop
        manifests older than the last ``keep_last``. Returns removed
        file paths. Time travel stays valid for retained versions.

        The ``grace_seconds`` window protects two concurrency races,
        each applied precisely rather than as a blanket mtime skip
        (round-7 advisor: the blanket skip silently made vacuum a no-op
        on any table written within the last hour):

        - IN-FLIGHT commits: an uncommitted write's files are
          referenced by no manifest until its link(2) lands, so
          without the skip a concurrent vacuum could delete another
          writer's staged-but-uncommitted data mid-commit (round-6
          advisor). Applies only to prefixes referenced by NO manifest
          at all AND younger than the grace window.
        - RECENTLY-RETIRED readers (round-8 advisor): a reader
          mid-scan of a time-travel version that just fell out of the
          ``keep_last`` window would otherwise have its parquet files
          deleted the instant a vacuum runs (Delta keeps tombstoned
          files for a retention window for the same reason). A version
          v is retired the moment the commit that pushes it past
          ``keep_last`` lands, so its files stay grace-protected while
          that retiring manifest is younger than ``grace_seconds`` —
          the manifest itself is still dropped (new time travel to v
          ends now), and the files reclaim on the first vacuum after
          the window. A reader that holds a scan open LONGER than the
          grace window is the documented residual exposure — size
          ``grace_seconds`` to the longest expected reader.

        Skipped prefixes are logged at INFO."""
        import logging

        vs = self.versions()
        retained = vs[-keep_last:] if keep_last > 0 else []
        manifests = {v: self.manifest(v) for v in vs}
        keep_files = {f for v in retained for f in manifests[v]["files"]}
        # grace-protect versions retired within the window: version
        # vs[i] left the keep_last window when vs[i+keep_last]
        # committed — use that manifest file's mtime as retirement time
        now = time.time()
        for i, v in enumerate(vs):
            if v in retained:
                continue
            j = min(i + keep_last, len(vs) - 1)
            retiring = os.path.join(self._manifest_dir, f"v{vs[j]}.json")
            try:
                retired_at = os.path.getmtime(retiring)
            except OSError:
                continue
            if now - retired_at < grace_seconds:
                keep_files.update(manifests[v]["files"])
        # every file any manifest on disk references → its prefix is a
        # committed prefix, not an in-flight staging directory
        committed_prefixes = {
            os.path.dirname(f) for m in manifests.values() for f in m["files"]
        }
        cutoff = time.time() - grace_seconds
        removed, skipped = [], []
        if os.path.isdir(self._data_dir):
            for staging in os.listdir(self._data_dir):
                sdir = os.path.join(self._data_dir, staging)
                if sdir not in committed_prefixes:
                    try:
                        if os.path.getmtime(sdir) > cutoff:
                            skipped.append(sdir)  # possibly in-flight
                            continue
                    except OSError:
                        continue
                for root, _dirs, names in os.walk(sdir):
                    for name in names:
                        p = os.path.join(root, name)
                        if name.endswith(".parquet") and p not in keep_files:
                            os.remove(p)
                            removed.append(p)
        if skipped:
            logging.getLogger(__name__).info(
                "vacuum(%s): skipped %d possibly-in-flight staging prefixes "
                "younger than grace_seconds=%s: %s",
                self.path, len(skipped), grace_seconds, skipped,
            )
        for v in vs:
            if v not in retained:
                os.remove(os.path.join(self._manifest_dir, f"v{v}.json"))
        return removed
