"""neo_olap_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference engine (jexp/neo-olap,
see SURVEY.md) Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, graphs as vertex/edge DataFrames, iterative analytics as
driver loops with checkpointing, plus the LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

from neo_olap_spark.registry import REGISTRY, oracle_sql, queries, query
from neo_olap_spark.session import get_spark
from neo_olap_spark.tables import TABLES, load

__all__ = [
    "REGISTRY",
    "TABLES",
    "get_spark",
    "load",
    "oracle_sql",
    "queries",
    "query",
]
