"""Query registry — the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 registers here with a Spark callable
(spark, sf_dir) -> DataFrame and, when SQL-expressible, a DuckDB oracle
SQL string. ``__spark_entry__.py`` re-exports ``queries()`` /
``oracle_sql()`` straight from this registry, so an operator is "done"
exactly when it lands here with a passing parity test.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    doc: str


REGISTRY: dict[str, Query] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``key``."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")
        REGISTRY[key] = Query(key=key, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _ensure_loaded() -> None:
    # Importing the operator modules populates REGISTRY via decorators.
    import neo_olap_spark.operators  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: q.fn for k, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {k: q.oracle for k, q in REGISTRY.items() if q.oracle is not None}
