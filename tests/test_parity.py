"""Differential tests: every oracle-backed query must hash-match DuckDB.

Mirrors the driver's t2 gate (stricter: exact values after rounding).
"""

from __future__ import annotations

import pytest

from neo_olap_spark.registry import REGISTRY, queries
from neo_olap_spark.testing import assert_parity

queries()  # populate REGISTRY

ORACLE_KEYS = sorted(k for k, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, key):
    q = REGISTRY[key]
    assert_parity(q.fn(spark, sf_dir), q.oracle, sf_dir)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    df = REGISTRY[key].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
