"""Versioned tables: a minimal metadata-log table format with time travel.

The reference's metadata notes are entirely about open table formats and
data-lake metadata management (/root/reference/metadata:1-17 — Iceberg /
Delta / Hudi studies): the core idea those formats share is that the LOG of
small metadata files, not the directory listing, is the source of truth —
a snapshot is the file list a log replay yields, so readers get atomic
commits, schema evolution, and time travel without touching the data files.

This module is that idea in miniature, Spark-first and dependency-free
(no delta-spark jars in this environment):

* layout::

      <table_dir>/
        _log/00000001.json  00000002.json ...   (one entry per commit)
        data/v1-<uuid>/part-*.parquet           (normal Spark parquet writes)

* each log entry: ``{"version", "timestamp_ms", "mode": "overwrite"|
  "append", "dirs": [relative data dirs]}``. A snapshot at version N =
  the dirs of the latest overwrite ≤ N plus every append after it.
* commits are atomic: the entry is written with O_EXCL create — two
  concurrent writers race on the version file name and exactly one wins
  (the Delta commit protocol, minus the retry loop).
* reads list ONLY the dirs the chosen snapshot names — stale data files
  from overwritten versions stay on disk for older snapshots (vacuum is a
  policy decision, not implemented).

Scale shape: data writes are ordinary distributed ``df.write.parquet``;
the log entry is one small driver-side JSON (same asymmetry as
Delta/Iceberg — metadata ops are O(commits), not O(data)). Reads hand
Spark an explicit file-dir list, so partition pruning / pushdown inside
each dir work exactly as for any parquet scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_log"
_DATA_DIR = "data"


@dataclass(frozen=True)
class Commit:
    version: int
    timestamp_ms: int
    mode: str            # "overwrite" | "append"
    dirs: tuple[str, ...]  # data dirs relative to table_dir


def _log_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _LOG_DIR, f"{version:08d}.json")


def read_log(table_dir: str) -> list[Commit]:
    """All commits in version order; [] for a non-table directory."""
    log_dir = os.path.join(table_dir, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return []
    commits = []
    for fname in sorted(os.listdir(log_dir)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(log_dir, fname)) as f:
            d = json.load(f)
        commits.append(Commit(d["version"], d["timestamp_ms"], d["mode"],
                              tuple(d["dirs"])))
    return commits


def write_table(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    timestamp_ms: int | None = None,
) -> Commit:
    """Commit ``df`` as the next version of the table at ``table_dir``.

    ``mode='append'`` adds files to the current snapshot; ``'overwrite'``
    starts a fresh one. Returns the committed entry.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(os.path.join(table_dir, _LOG_DIR), exist_ok=True)
    commits = read_log(table_dir)
    version = (commits[-1].version + 1) if commits else 1
    rel = os.path.join(_DATA_DIR, f"v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(os.path.join(table_dir, rel))
    entry = Commit(
        version=version,
        timestamp_ms=int(time.time() * 1000) if timestamp_ms is None else timestamp_ms,
        mode=mode,
        dirs=(rel,),
    )
    # O_EXCL: exactly one writer can create this version file.
    with open(_log_path(table_dir, version), "x") as f:
        json.dump({"version": entry.version, "timestamp_ms": entry.timestamp_ms,
                   "mode": entry.mode, "dirs": list(entry.dirs)}, f)
    return entry


def resolve_snapshot(
    table_dir: str,
    version: int | None = None,
    as_of_ms: int | None = None,
) -> tuple[int, list[str]]:
    """(version, absolute data dirs) for a snapshot.

    ``version=None, as_of_ms=None`` → latest. ``as_of_ms`` picks the last
    commit at-or-before the timestamp (time travel by wall clock).
    """
    commits = read_log(table_dir)
    if not commits:
        raise FileNotFoundError(f"no versioned table at {table_dir!r}")
    if version is not None and as_of_ms is not None:
        raise ValueError("pass version OR as_of_ms, not both")
    if as_of_ms is not None:
        eligible = [c for c in commits if c.timestamp_ms <= as_of_ms]
        if not eligible:
            raise LookupError(
                f"no snapshot at or before timestamp {as_of_ms} "
                f"(earliest is {commits[0].timestamp_ms})")
        version = eligible[-1].version
    if version is None:
        version = commits[-1].version
    chosen = [c for c in commits if c.version <= version]
    if not chosen or chosen[-1].version != version:
        known = [c.version for c in commits]
        raise LookupError(f"version {version} not in log (have {known})")
    dirs: list[str] = []
    for c in chosen:
        if c.mode == "overwrite":
            dirs = list(c.dirs)
        else:
            dirs.extend(c.dirs)
    return version, [os.path.join(table_dir, d) for d in dirs]


def read_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Read a snapshot as a DataFrame (schema merged across its data dirs,
    so appends may evolve the schema additively)."""
    _, dirs = resolve_snapshot(table_dir, version, as_of_ms)
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def vacuum(table_dir: str, keep_last: int = 1) -> dict:
    """Physically delete data dirs unreachable from the newest ``keep_last``
    snapshots, and truncate their log entries (the Delta VACUUM analog —
    the policy decision the module docstring deferred).

    A data dir is retained iff some kept snapshot's replay references it.
    Log entries are truncated only BEFORE the oldest kept snapshot's base
    overwrite — replay of every kept snapshot starts at an overwrite (or
    the table's first commit), so kept reads replay identically after the
    vacuum; versions older than the kept window become unreadable cleanly
    ("version not in log"), never a missing-file read error. The newest
    snapshot is always kept. Returns ``{"removed_dirs": n,
    "removed_versions": m}``.

    Scale note: metadata-only decision (O(commits) log replay) plus local
    directory removals — never touches surviving data files.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    commits = read_log(table_dir)
    if not commits:
        raise FileNotFoundError(f"no versioned table at {table_dir!r}")
    oldest_kept = commits[-keep_last:][0].version
    # the replay chain of the oldest kept snapshot starts at its latest
    # overwrite (or the very first commit) — log entries from there on stay
    base = max(
        (c.version for c in commits
         if c.mode == "overwrite" and c.version <= oldest_kept),
        default=commits[0].version,
    )
    keep_dirs: set[str] = set()
    for c in commits[-keep_last:]:
        _, dirs = resolve_snapshot(table_dir, version=c.version)
        keep_dirs.update(dirs)
    removed_dirs = 0
    data_root = os.path.join(table_dir, _DATA_DIR)
    if os.path.isdir(data_root):
        for entry in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, entry)
            if full not in keep_dirs:
                shutil.rmtree(full, ignore_errors=True)
                removed_dirs += 1
    removed_versions = 0
    for c in commits:
        if c.version < base:
            try:
                os.remove(_log_path(table_dir, c.version))
                removed_versions += 1
            except FileNotFoundError:
                pass
    return {"removed_dirs": removed_dirs, "removed_versions": removed_versions}


def history(table_dir: str) -> list[dict]:
    """Commit history, latest first (DESCRIBE HISTORY analog)."""
    return [
        {"version": c.version, "timestamp_ms": c.timestamp_ms, "mode": c.mode,
         "n_dirs": len(c.dirs)}
        for c in reversed(read_log(table_dir))
    ]
