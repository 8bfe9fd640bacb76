"""Ship the ``duckdb_read_spark`` package to Spark executors.

Module-level (pandas) UDFs pickle BY REFERENCE: the executor-side Python
worker unpickles them by importing ``duckdb_read_spark.functions.udfs``,
so the package must be importable inside every worker process. Workers do
NOT inherit the driver's runtime ``sys.path`` edits — they are spawned by
the JVM with only ``spark.pythonpath`` plus the pyFiles directory — so a
driver launched from any cwd other than the repo root used to crash every
UDF-backed function with ``ModuleNotFoundError``. On a real multi-node
cluster (the 100 TB design target) executors never share the driver's
filesystem layout at all, so this is the deployment-critical path, not an
edge case.

The fix is Spark's own mechanism for exactly this: zip the package once
per content version and ``SparkContext.addPyFile`` it. The zip fans out
to every current and future executor and is prepended to the workers'
``sys.path``; ``addPyFile`` is cluster-wide, so one call in
``Engine.__init__`` covers dynamic executor allocation too.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

# (applicationId, zip path) pairs already shipped from this driver
# process — keeps repeated Engine constructions over a shared
# SparkSession from re-adding the file (Spark would only warn).
_SHIPPED: set[tuple[str, str]] = set()

# zip path memo: the package source cannot change inside one driver
# process (modules are already imported), so the sha256 walk over
# every .py file runs ONCE per process instead of once per Engine
# (review r12: the _SHIPPED guard alone never skipped the walk).
_ZIP_PATH: str | None = None


def _package_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _iter_package_files(root: str) -> list[str]:
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                out.append(os.path.join(dirpath, fn))
    return out


def build_package_zip() -> str:
    """Build (or reuse) a content-addressed zip of the package under the
    system temp dir and return its path.

    The file name embeds a sha256 of every source file, so a code change
    yields a NEW name (Spark refuses re-adding a different file under an
    existing basename), while unchanged sources converge on one artifact
    across Engines, test processes, and concurrent drivers. Zip entries
    carry a fixed timestamp so identical sources produce identical bytes.
    """
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    root = _package_root()
    pkg = os.path.basename(root)
    files = _iter_package_files(root)
    h = hashlib.sha256()
    blobs: list[tuple[str, bytes]] = []
    for f in files:
        rel = os.path.relpath(f, root).replace(os.sep, "/")
        with open(f, "rb") as fh:
            data = fh.read()
        h.update(rel.encode())
        h.update(b"\0")
        h.update(data)
        blobs.append((f"{pkg}/{rel}", data))
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg}-{h.hexdigest()[:16]}.zip"
    )
    if os.path.exists(zpath):
        _ZIP_PATH = zpath
        return zpath
    # Write-then-rename so a concurrent builder never observes a torn zip.
    tmp = f"{zpath}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, data in blobs:
            zf.writestr(zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0)), data)
    os.replace(tmp, zpath)
    _ZIP_PATH = zpath
    return zpath


def ship_package(spark) -> str | None:
    """Idempotently ``addPyFile`` the package zip onto this session's
    SparkContext; returns the zip path (None if the context is gone)."""
    try:
        sc = spark.sparkContext
        app_id = sc.applicationId
    except Exception:  # stopped/Connect-only session: nothing to ship to
        return None
    zpath = build_package_zip()
    key = (app_id, zpath)
    if key in _SHIPPED:
        return zpath
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
    return zpath
