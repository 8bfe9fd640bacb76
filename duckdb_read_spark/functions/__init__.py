"""Function surface (SURVEY §2.1 X1-X4): vectorized UDFs, UDAF, UDTF.

The reference's extension mechanism registers functions into the catalog at
load time (entry symbol → FinishLoad, /root/reference/duckdb:46-55); here
``register_builtin_udfs(engine)`` plays that role for the built-in set.
Every UDF is Arrow-batched (pandas_udf) — never row-at-a-time Python in a
hot path (SURVEY §1.2; SNIPPETS.md:30-58 shows the same patterns).
"""

from .udfs import register_builtin_udfs, vec_cosine, vec_l2norm

__all__ = ["register_builtin_udfs", "vec_l2norm", "vec_cosine"]
