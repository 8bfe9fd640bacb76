"""Sources & sinks (SURVEY §2.1 S3-S5).

Readers live on Engine (register_parquet/csv/json — the binder name-
resolution analog); this module adds the write side and glob/multi-file
helpers. All writers go through Spark's native committers — at scale these
are the only safe way to produce atomic multi-file outputs.
"""

from .sinks import write_csv, write_json, write_parquet, write_sorted_parquet

__all__ = ["write_parquet", "write_csv", "write_json", "write_sorted_parquet"]
