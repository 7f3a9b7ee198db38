"""Differential tests: every oracle-backed query must hash-match DuckDB.

Mirrors the driver's t2 gate (stricter: exact values after rounding).
"""

from __future__ import annotations

import pytest

import json
import pathlib

from neo_olap_spark.registry import REGISTRY, queries
from neo_olap_spark.testing import assert_no_composite_output, assert_parity

queries()  # populate REGISTRY

ORACLE_KEYS = sorted(k for k, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, q in REGISTRY.items() if q.oracle is None)

_LEDGER = pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_local_full.json"


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, key):
    q = REGISTRY[key]
    assert_parity(q.fn(spark, sf_dir), q.oracle, sf_dir)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    df = REGISTRY[key].fn(spark, sf_dir)
    assert_no_composite_output(df, key)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_composite_output_columns():
    """Registry-wide guard: no registered query's output schema may
    contain an ArrayType/MapType/StructType column — the driver's row
    canonicalizer sorts raw output columns with pandas sort_values,
    which raises `TypeError: unhashable type` on composite cells
    (round 7's only driver-red rows, q_text_postings and
    q_multimodal_scenes, were exactly this class). Sweeps the
    committed ledger's recorded per-key schemas so the check covers
    the WHOLE registry without re-running Spark; the ledger itself is
    staleness-gated by tests/test_correctness_artifact.py and its
    generator applies assert_no_composite_output live."""
    art = json.loads(_LEDGER.read_text())
    for key in REGISTRY:
        entry = art.get(key)
        assert entry is not None, f"{key}: missing from ledger (regenerate)"
        schema = entry.get("spark_schema")
        assert schema, f"{key}: ledger entry has no spark_schema (regenerate)"
        for field in schema:
            _, _, dtype = field.partition(":")
            assert not any(
                m in dtype for m in ("array<", "map<", "struct<")
            ), f"{key}: composite output column {field!r} — serialize to CSV"
