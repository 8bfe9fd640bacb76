"""Shared fixtures: one SparkSession and one DuckDB connection per test run."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from duckdb_read_spark.conf import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("duckdb_read_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from duckdb_read_spark import Engine

    eng = Engine(spark=spark)
    eng.register_fixture_dir(SF_SMOKE)
    return eng


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with raw views over the same parquet files — the
    exact setup the driver's oracle uses (no ts shim in the view; oracle SQL
    carries its own CAST shim)."""
    import duckdb

    from duckdb_read_spark.conf import TABLES

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_SMOKE, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con
