"""POSITIONAL JOIN — DuckDB's by-row-position pairing, Spark-first.

DuckDB's ``FROM a POSITIONAL JOIN b`` pairs the i-th row of each input
and NULL-pads the shorter side. The semantics only exist for inputs
with a defined row order, which for file-backed tables is (file order,
in-file row order) — exactly what Spark exposes as
``_metadata.file_path`` + ``_metadata.row_index`` on parquet scans.

Scale design (the reason this is an operator over PATHS, not over
arbitrary DataFrames): the global row position is computed WITHOUT a
global sort or zipWithIndex repartition. Per-file row counts come from
the parquet footers (driver-side, O(files) — the same metadata class
as any manifest replay); each file's cumulative offset is broadcast as
a literal map, and every row's position is ``offset[file] +
row_index`` — a pure projection on the distributed scan, zero
shuffles. The join itself is one equi-join on the position (and Spark
broadcasts the smaller side under AQE like any other equi-join).

Ref parity: DuckDB POSITIONAL JOIN docs (public SQL surface); the
file order matches DuckDB's sorted-glob expansion [measured in
tests/oracle via the q133 hash check].
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _parquet_files(path: str) -> list[str]:
    """The parquet files of ``path`` in DuckDB's glob order
    (lexicographic): a single file, a directory, or a glob pattern."""
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in os.listdir(path)
                 if f.endswith(".parquet")]
    elif any(ch in path for ch in "*?["):
        files = _glob.glob(path)
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files at {path!r}")
    return sorted(files)


def with_row_position(spark: SparkSession, path: str,
                      pos_col: str = "pos") -> DataFrame:
    """Read parquet ``path`` with a global 0-based row-position column.

    Positions follow (lexicographic file order, in-file row order) —
    stable across partitioning, splits, and re-runs, because they are
    derived from file offsets + ``_metadata.row_index`` rather than
    from any task ordering. Zero shuffles: one footer read per file on
    the driver, then a projection.
    """
    import pyarrow.parquet as pq

    files = _parquet_files(path)
    offsets: dict[str, int] = {}
    total = 0
    for f in files:
        offsets[os.path.abspath(f)] = total
        total += pq.ParquetFile(f).metadata.num_rows
    from ..pathnorm import decoded_file_path

    # file:/abs, percent-encoded → decoded bare abs path (pathnorm)
    norm = decoded_file_path(F.col("_metadata.file_path"))
    off_map = F.create_map(
        *[x for k, v in sorted(offsets.items())
          for x in (F.lit(k), F.lit(v))])
    df = spark.read.parquet(*files)
    return df.select(
        (off_map[norm] + F.col("_metadata.row_index"))
        .cast("bigint").alias(pos_col), "*")


def positional_join(spark: SparkSession, left_path: str, right_path: str,
                    pos_col: str | None = None) -> DataFrame:
    """``left POSITIONAL JOIN right`` over two parquet locations: row i
    of the left pairs with row i of the right; the shorter side reads
    back NULL (DuckDB pads to the LONGER input — full outer on the
    position). Column order is left's then right's, like DuckDB.

    ``pos_col`` optionally keeps the position column in the output
    (DuckDB drops it; hash-checked queries keep it for a total order).
    """
    return positional_join_chain(spark, [left_path, right_path],
                                 pos_col)


def positional_join_chain(spark: SparkSession, paths: list[str],
                          pos_col: str | None = None) -> DataFrame:
    """``t1 POSITIONAL JOIN t2 POSITIONAL JOIN t3 …`` folded left to
    right — each step pads to the LONGER side (full outer on the
    position), so the chain's row count is the max input length, like
    DuckDB's chained form [measured 1.0.0]. Still zero shuffles for
    the position derivation; the N-1 equi-joins share the one position
    key (ADVICE r9: the pairwise rewrite left 'POSITIONAL JOIN c'
    verbatim in chains, which Spark silently CROSS-joined)."""
    keep = pos_col is not None
    pc = pos_col or "__pj_pos"
    out = with_row_position(spark, paths[0], pc)
    cols = [c for c in out.columns if c != pc]
    for p in paths[1:]:
        nxt = with_row_position(spark, p, pc)
        out = out.join(nxt, pc, "full")
        cols += [c for c in nxt.columns if c != pc]
    return out.select(*(([pc] if keep else []) + cols))
