"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over neo_olap_spark's query registry: every operator from
SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable plus a
DuckDB oracle SQL twin (when SQL-expressible) in
neo_olap_spark/operators/*.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neo_olap_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top-10 highest-degree
    nodes of the derived graph — the reference's signature output
    ("top-10 most-visited nodes", Runner.java:63,193-198) with exact
    degree counting standing in for racy visit counting."""
    return _registry.queries()["q_topn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query key."""
    return _registry.oracle_sql()
