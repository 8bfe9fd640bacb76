"""Example extension: vector math functions (the tpcds_extension analog —
the reference cites extension/tpcds as the canonical extension example,
/root/reference/duckdb:54,66).

Load with ``engine.load("duckdb_read_spark.extensions.vector_ext")``.
"""

from __future__ import annotations


def register(engine) -> None:
    """Entry symbol (/root/reference/duckdb:53): add this extension's
    functions to the engine catalog."""
    from ..functions import register_builtin_udfs

    register_builtin_udfs(engine)
