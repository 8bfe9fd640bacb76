"""duckdb_read_spark — a PySpark-native analytical SQL engine.

Re-expresses the capability surface studied by cmemory/duckdb-read (an
embedded OLAP SQL engine over Parquet, /root/reference/duckdb:1-155) on
Apache Spark: DataFrame/SQL as the declarative layer, Catalyst/Tungsten as
the optimizer/executor, plus LLM-data-pipeline operators (dedup,
similarity, text analysis, multimodal) designed for 100 TB scale.
"""

from .engine import Engine
from .catalog import register_tables, load_table
from .queries import QUERIES, QuerySpec

__all__ = ["Engine", "register_tables", "load_table", "QUERIES", "QuerySpec"]
__version__ = "0.1.0"
