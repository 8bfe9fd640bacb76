"""True array-valued outputs (A12) — value-normalized oracle only.

The DRIVER contract joins arrays to strings (its pandas canonicalizer
cannot sort ndarray cells — round-1 q42 err), so the declared q42 emits a
'|'-joined string.  The actual array semantics (sort_array(collect_list)
== array_agg(ORDER BY)) are pinned here through oracle.py's normalizer,
which compares arrays element-wise without pandas.
"""

from __future__ import annotations

from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows
from duckdb_read_spark.queries import ARRAY_Q42


def test_array_agg_sorted_true_array(engine, duck):
    got = spark_rows(engine.sql(ARRAY_Q42.spark))
    want = duckdb_rows(duck, ARRAY_Q42.duckdb_sql)
    assert got == want, diff_summary(got, want)
    # and it really is an array column, not a joined string
    assert any(isinstance(v, tuple) and len(v) == 5 for row in got for v in row)
