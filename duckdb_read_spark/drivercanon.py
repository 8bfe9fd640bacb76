"""Driver-faithful result canonicalization (the hard correctness gate).

The per-round driver compares our Spark output against the DuckDB oracle by
stringify-and-hash: ``toPandas()`` / ``fetchdf()`` → reorder columns by name
→ ``sort_values`` over all columns → ``str()`` every cell → hash.  That is
STRICTER than the value-normalized compare in oracle.py — e.g. a Spark
``Decimal('138014.0000')`` vs a DuckDB float64 ``138014.0`` has equal value
but unequal string, and a raw array column crashes pandas ``sort_values``
(round-1 q42).  This module replicates the driver's canonicalization so CI
fails exactly when the driver would (VERDICT r1 "What's wrong" §4).

Dtype contract for every declared/operator query output (SURVEY §2.0 adds):
  * no DECIMAL output columns — exact decimal math stays internal; the
    output is CAST(... AS DOUBLE) (bit-identical when the decimal is exact
    in both engines) or CAST(decimal AS STRING) (fixed-scale text) when the
    underlying float math is ulp-divergent between engines;
  * no DuckDB HUGEINT outputs — SUM(int) on the DuckDB side is wrapped in
    CAST(... AS BIGINT) (fetchdf turns HUGEINT into float64, '3.0' != '3');
  * no raw array/map output columns — join to string (driver canonicalizer
    cannot sort ndarray cells); the true array semantics keep pytest oracles.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reorder columns by name, sort rows by all columns — like the driver.

    Raises TypeError on unsortable cells (e.g. ndarray), which the driver
    records as an ``err`` row; we surface it as a test failure instead.
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(cols):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    return pdf.reset_index(drop=True)


def frame_hash(pdf: pd.DataFrame) -> str:
    """Hash of the stringified canonical frame (column-major, like rows of
    ``str(cell)``).  Any dtype/rendering drift between engines changes it."""
    canon = canon_frame(pdf)
    h = hashlib.sha256()
    for c in canon.columns:
        h.update(str(c).encode())
        h.update(b"\x1e")
        # Column-level astype(str), NOT per-value str(): pandas formats an
        # all-midnight datetime64 column as date-only ('2024-01-01'), which
        # is how a DuckDB DATE (fetchdf → datetime64) hash-matches a Spark
        # DATE (toPandas → datetime.date) in the driver (q35 passed r1).
        for v in canon[c].astype(str):
            h.update(v.encode())
            h.update(b"\x1f")
    return h.hexdigest()


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    """Driver-style result row: rows/schema/hash match booleans."""
    res: dict = {
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        "hash_match": None,
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "err": None,
    }
    try:
        res["hash_match"] = frame_hash(spark_pdf) == frame_hash(oracle_pdf)
    except Exception as e:  # unsortable / unstringifiable cells
        res["err"] = f"{type(e).__name__}: {e}"
    return res


def first_diff(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
               limit: int = 4) -> str:
    """Human-readable first stringified mismatch, for debugging fails."""
    a, b = canon_frame(spark_pdf), canon_frame(oracle_pdf)
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row counts differ: {len(a)} vs {len(b)}"
    out = []
    for c in a.columns:
        sa = list(a[c].astype(str))
        sb = list(b[c].astype(str))
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(sa, sb)) if x != y]
        if bad:
            i, x, y = bad[0]
            out.append(
                f"col {c!r} (spark {a[c].dtype} vs oracle {b[c].dtype}): "
                f"{len(bad)} cells, first at row {i}: {x!r} != {y!r}"
            )
        if len(out) >= limit:
            break
    return "; ".join(out) if out else "no cell diff (dtype/order only?)"
