"""Example extension: vector math functions (the tpcds_extension analog —
the reference cites extension/tpcds as the canonical extension example,
/root/reference/duckdb:54,66).

Load with ``engine.load("duckdb_read_spark.extensions.vector_ext")``.
"""

from __future__ import annotations

# Checked against an INSTALL ... VERSION pin at LOAD time (the LoadInfo
# version field, /root/reference/duckdb:30-33).
__extension_version__ = "1.0.0"


def register(engine) -> None:
    """Entry symbol (/root/reference/duckdb:53): add this extension's
    functions to the engine catalog."""
    from ..functions import register_builtin_udfs

    register_builtin_udfs(engine)
