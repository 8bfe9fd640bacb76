"""Executor packaging regression gate (VERDICT r11 "What's wrong" #1).

Module-level pandas UDFs pickle BY REFERENCE, so Python workers must be
able to ``import duckdb_read_spark`` — and workers do NOT inherit the
driver's runtime ``sys.path`` edits. Before the pkgship fix, any driver
launched with cwd outside the repo root (i.e. every real cluster
deployment) crashed all UDF-backed functions with ModuleNotFoundError.

The gate spawns a CLEAN subprocess: cwd=/tmp, no PYTHONPATH env (so the
JVM-spawned workers have no inherited path either), repo importable only
via a driver-side ``sys.path.insert``. It must run a pandas-UDF-backed
scalar, a UDF-rendered interval cast, and an applyInPandas operator.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})  # driver-side only; workers never see this
from duckdb_read_spark.engine import Engine

eng = Engine(master="local[2]")
# 1) module-level pandas UDF (levenshtein) — pickled by reference
[r1] = eng.sql("SELECT levenshtein('', 'abc') AS d", dialect="duckdb").collect()
assert r1.d == 3, r1
# 2) UDF-backed interval render (the lazy-import site of VERDICT #1)
[r2] = eng.sql(
    "SELECT CAST(TIMESTAMP '2024-01-02 03:30:00' - TIMESTAMP '2024-01-01' "
    "AS VARCHAR) AS iv",
    dialect="duckdb",
).collect()
assert r2.iv == "1 day 03:30:00", r2
# 3) applyInPandas operator
from duckdb_read_spark.operators.groupmap import zscore_normalize_pandas

df = eng.spark.createDataFrame(
    [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0)],
    "g string, v double",
)
rows = zscore_normalize_pandas(df, "g", "v").collect()
assert len(rows) == 5 and all(r.z is not None for r in rows), rows
eng.spark.stop()
print("PKGSHIP_OK")
"""


def test_udf_surface_from_clean_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=_REPO)],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "PKGSHIP_OK" in proc.stdout


def test_zip_is_content_addressed_and_reused():
    from duckdb_read_spark.pkgship import build_package_zip

    p1 = build_package_zip()
    p2 = build_package_zip()
    assert p1 == p2 and os.path.exists(p1)
    import zipfile

    with zipfile.ZipFile(p1) as zf:
        names = zf.namelist()
    assert "duckdb_read_spark/dialect.py" in names
    assert "duckdb_read_spark/functions/udfs.py" in names
    assert not any("__pycache__" in n for n in names)


def test_ship_package_idempotent(spark):
    from duckdb_read_spark.pkgship import ship_package

    z1 = ship_package(spark)
    z2 = ship_package(spark)
    assert z1 == z2 and z1 is not None
