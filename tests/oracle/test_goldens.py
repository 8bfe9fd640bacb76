"""Golden regression tier: live results must hash-match the frozen goldens.

Runs without DuckDB. Regenerate intentionally with
``python -m tests.oracle.golden`` after a deliberate contract change.
"""

from __future__ import annotations

import json
import os

import pytest

from tests.oracle.golden import GOLDEN_PATH, SF_DIR, result_hash

pytestmark = pytest.mark.skipif(
    not GOLDEN_PATH.exists()
    or os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_DIR) != SF_DIR,
    reason="goldens are pinned to sf0.001",
)


def _goldens() -> dict[str, str]:
    return json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists() else {}


@pytest.mark.parametrize("name", sorted(_goldens()))
def test_golden(name, spark):
    from duckdb_read_spark.catalog import register_tables
    from duckdb_read_spark.op_queries import OP_QUERIES
    from duckdb_read_spark.oracle import spark_rows
    from duckdb_read_spark.queries import QUERIES

    register_tables(spark, SF_DIR)
    if name in QUERIES:
        rows = spark_rows(spark.sql(QUERIES[name].spark))
    else:
        rows = spark_rows(OP_QUERIES[name].runner(spark, SF_DIR))
    assert result_hash(rows) == _goldens()[name]
