"""Golden-file tier (SURVEY §5.2): frozen hashes of normalized results.

``python -m tests.oracle.golden`` regenerates the goldens for the declared
SQL + operator queries at sf0.001. The test tier compares live results
against these hashes WITHOUT needing DuckDB — a fast regression net for
environments where the oracle engine is absent, and a tripwire for
accidental contract edits (SURVEY warns: treat query-text edits as contract
changes).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

GOLDEN_PATH = Path(__file__).parent / "goldens" / "sf0.001.json"
SF_DIR = "/root/testdata/sf0.001"


def result_hash(rows) -> str:
    """sha256 over the repr of normalized (sorted) rows."""
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def compute_all(spark) -> dict[str, str]:
    from duckdb_read_spark.catalog import register_tables
    from duckdb_read_spark.op_queries import OP_QUERIES
    from duckdb_read_spark.oracle import spark_rows
    from duckdb_read_spark.queries import QUERIES

    register_tables(spark, SF_DIR, force=True)
    out: dict[str, str] = {}
    for name, spec in QUERIES.items():
        out[name] = result_hash(spark_rows(spark.sql(spec.spark)))
    for name, spec in OP_QUERIES.items():
        if spec.duckdb_sql is None:
            continue  # hash/approximate ops: determinism tested elsewhere
        out[name] = result_hash(spark_rows(spec.runner(spark, SF_DIR)))
    return out


def main() -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from pyspark.sql import SparkSession

    from duckdb_read_spark.conf import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("golden-gen")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    goldens = compute_all(spark)
    os.makedirs(GOLDEN_PATH.parent, exist_ok=True)
    GOLDEN_PATH.write_text(json.dumps(goldens, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(goldens)} goldens to {GOLDEN_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
