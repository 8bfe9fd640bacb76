"""Table registration — names → relations in the session catalog.

Mirrors the reference binder's name resolution step (the binder resolves
table names/types at bind time, /root/reference/duckdb:34-37): we register
each parquet file as a temp view once, and every query thereafter resolves
against the catalog.

The one non-trivial piece is the ns-timestamp shim (SURVEY §2.4.4):
``events.ts`` is INT64 TIMESTAMP(NANOS) in the parquet footer, which
vanilla Spark refuses to read. With ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as LongType nanoseconds and we rebuild a microsecond
TIMESTAMP in the view itself, so every downstream query sees a normal
timestamp column. DuckDB reads the same column natively as TIMESTAMP_NS and
truncates to µs via CAST(ts AS TIMESTAMP) — the two agree exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .conf import TABLES, apply_runtime_confs

# Detect ns-timestamp columns per table. Driven by the parquet footer in
# principle; the fixture set has exactly one (events.ts), declared here and
# verified by schema check at registration time.
_NS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Cache of (session id, sf_dir) → registered, so per-query registration
# from __spark_entry__ costs one footer read per table per session.
_REGISTERED: set[tuple[int, str]] = set()


def apply_schema_shims(df: DataFrame, parquet_path: str | None = None) -> DataFrame:
    """Re-derive µs timestamps for INT64 TIMESTAMP(NANOS) parquet columns.

    With ``nanosAsLong`` the Spark schema shows them as plain LongType, so
    we consult the parquet footer (via pyarrow) to find which long columns
    are really nanosecond timestamps.
    """
    if parquet_path is None:
        return df
    try:
        import glob as _glob

        import pyarrow.parquet as pq

        candidates = sorted(_glob.glob(parquet_path)) or [parquet_path]
        target = candidates[0]
        if os.path.isdir(target):
            # Spark-written dataset directory: read the footer of any part
            # file (all parts share one schema) — pq.read_schema on the
            # directory itself raises and would silently skip the shim.
            parts = sorted(_glob.glob(os.path.join(target, "*.parquet")))
            if not parts:
                return df
            target = parts[0]
        arrow_schema = pq.read_schema(target)
    except Exception:
        return df
    spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for fld in arrow_schema:
        if str(fld.type) == "timestamp[ns]" and spark_types.get(fld.name) == "bigint":
            df = df.withColumn(fld.name, F.expr(f"timestamp_micros({fld.name} DIV 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame, with schema shims applied."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NS_TS_COLUMNS.get(name, ()):
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        if types.get(col) == "bigint":
            # ns → µs: DIV truncation matches DuckDB's CAST(ts AS TIMESTAMP).
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def register_tables(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register every fixture table in ``sf_dir`` as a temp view.

    Idempotent per (session, dir); ``force=True`` re-registers (used when
    switching scale factors inside one session).
    """
    key = (id(spark), os.path.abspath(sf_dir))
    if not force and key in _REGISTERED:
        return
    apply_runtime_confs(spark)
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    # Drop stale cache entries for this session (other sf dirs).
    for k in [k for k in _REGISTERED if k[0] == id(spark)]:
        _REGISTERED.discard(k)
    _REGISTERED.add(key)
